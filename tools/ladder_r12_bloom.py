#!/usr/bin/env python
"""Round-12 scale-ladder, Bloom leg: PROBE COST vs BUILD CARDINALITY.

The claim under test is the operator's whole reason to exist: the
exact semi-join's cost scales with BOTH sides (once the build side
outgrows a raw broadcast, the PROBE side shuffles), while the Bloom
probe's cost is flat in the build cardinality — the filter is a
fixed-size word table however many keys built it, and the probe is
n_hashes map-side broadcast joins over one scan.

Legs: build ∈ {1M, 4M, 10M} keys against a FIXED 8M-row probe and a
FIXED 2^20-word (65M-bit) filter.  Per leg we record
  - build_sec: one bit_or aggregation over the build keys (the
    train-once analog of the IVF-PQ split — amortized at deployment,
    priced separately on the same principle as LADDER_r11's
    train/query legs);
  - probe_sec: bloom_probe over the 8M rows (the serving path);
  - exact_sec: the exact left-semi join with raw broadcast DISABLED
    (autoBroadcastJoinThreshold=-1), i.e. the shape the cluster is
    forced into when the build side outgrows a broadcast — both sides
    shuffle;
  - n_candidates / n_true / fp observed, so the pruning is shown real
    (the 10M-key notch deliberately pushes load toward 0.6 and a
    few-percent fp — the filter stays USEFUL, unlike the registered
    query's intentionally saturated sf0.1 regime).

Expect: probe_sec ~flat across notches (same probe, same filter
shape), build_sec ~linear in keys, exact_sec growing with build and
paying the probe shuffle every time.  Run idle (no concurrent suite):
  python tools/ladder_r12_bloom.py | tee -a LADDER_r12.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_pipeline_core_etl_spark.operators import sketches  # noqa: E402
from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402

WORDS = 1 << 20  # 65M bits; load 0.06 -> 0.62 across the notches
HASHES = 4
PROBE_ROWS = 8_000_000
BUILD_NOTCHES = [1_000_000, 4_000_000, 10_000_000]


def main() -> None:
    spark = get_spark(app_name="ladder_r12_bloom")
    spark.sparkContext.setLogLevel("ERROR")

    # probe keys half-overlap the densest build domain so n_true is
    # non-trivial at every notch
    probe = (
        spark.range(PROBE_ROWS)
        .select((F.col("id") * 3 + 1).alias("key"))
        .repartition(32)
        .localCheckpoint(eager=True)
    )

    for n_build in BUILD_NOTCHES:
        build = (
            spark.range(n_build)
            .select((F.col("id") * 2).alias("key"))  # evens: ~half the probe hits
            .repartition(32)
            .localCheckpoint(eager=True)
        )

        t0 = time.perf_counter()
        words = sketches.bloom_words(build, "key", WORDS, HASHES).localCheckpoint(
            eager=True
        )
        build_sec = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        n_candidates = (
            sketches.bloom_probe(probe, "key", words, WORDS, HASHES)
            .where("is_candidate")
            .count()
        )
        probe_sec = round(time.perf_counter() - t0, 3)

        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            t0 = time.perf_counter()
            n_true = probe.join(build, "key", "left_semi").count()
            exact_sec = round(time.perf_counter() - t0, 3)
        finally:
            spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")

        print(
            json.dumps(
                {
                    "leg": "bloom_probe_vs_exact",
                    # 4-independent-md5 rows in LADDER_r12.jsonl predate
                    # this field; "km2" = Kirsch-Mitzenmacher double
                    # hashing (2 md5s, positions derived arithmetically)
                    "hashing": "km2",
                    "build_keys": n_build,
                    "probe_rows": PROBE_ROWS,
                    "words": WORDS,
                    "build_sec": build_sec,
                    "probe_sec": probe_sec,
                    "exact_sec": exact_sec,
                    "n_candidates": n_candidates,
                    "n_true": n_true,
                    "false_pos": n_candidates - n_true,
                }
            ),
            flush=True,
        )
        words.unpersist()
        build.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
