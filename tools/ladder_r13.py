#!/usr/bin/env python
"""Round-13 ladder: prove or delete ``spark.pos.cc.prepartitionEdges``
(VERDICT r12 #6 — the flag landed in r12 with no recorded evidence in
its target regime).

The flag's claim: on a LARGE graph the dominant per-round byte mover in
``connected_components`` is the edge side of the message join (the
lazily-symmetrized view re-crosses its exchange every round because a
localCheckpoint forgets partitioning); caching the symmetrized list
hash-partitioned on the join key should win once rounds × 2E-row
exchanges outweigh one cache build.

Leg: a CHAIN graph of N nodes (diameter N → ~log2 N pointer-halving
rounds — the max-rounds regime where the per-round edge exchange is
paid most often), flag off vs on, same JVM ordering off-first.

Run:  python tools/ladder_r13.py [N ...]   | tee -a LADDER_r13.jsonl
"""

from __future__ import annotations

import json
import sys
import time

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402
from pos_pipeline_core_etl_spark.operators.dedup import (  # noqa: E402
    connected_components,
)


def leg(spark, n: int, flag: str) -> dict:
    spark.conf.set("spark.pos.cc.prepartitionEdges", flag)
    edges = spark.range(n - 1).select(
        F.col("id").alias("doc_a"), (F.col("id") + 1).alias("doc_b")
    )
    t0 = time.time()
    labels = connected_components(edges, max_iters=64)
    agg = labels.agg(
        F.count(F.lit(1)).alias("n"), F.sum("component_id").alias("s")
    ).collect()[0]
    sec = round(time.time() - t0, 3)
    assert agg["n"] == n and agg["s"] == 0, (agg["n"], agg["s"])
    return {
        "leg": "cc_chain_prepartition",
        "keys": n,
        "prepartition": flag,
        "sec": sec,
    }


def main() -> None:
    ns = [int(a) for a in sys.argv[1:]] or [5_000_000, 20_000_000]
    spark = get_spark(app_name="ladder_r13")
    for n in ns:
        for flag in ("false", "true"):
            row = leg(spark, n, flag)
            print(json.dumps(row), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
