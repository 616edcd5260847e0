#!/usr/bin/env python
"""Round-10 sketch-family ladder: KMV vs exact count-distinct per notch.

Three legs per notch over lineitem's (l_returnflag, l_orderkey):
- exact_count_distinct: the shuffle the sketch replaces;
- kmv_single_pass: kmv_group_estimates (distinct → one window rank);
- kmv_sharded_merge: kmv_merge_sketch over l_orderkey%4 shards + the
  estimate agg — the partial-aggregate shape a cluster run uses.

Also prints the estimates themselves so the error column of the
PERFORMANCE.md paragraph comes from the same run that timed them.
Fixtures: tools/make_scaled_bench.py notches (same as ladder_r10.py).
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

NOTCHES = {
    "1x(sf0.1)": "/root/testdata/sf0.1",
    "10x": "/tmp/spark_graft_sf1",
    "30x": "/tmp/spark_graft_sf3",
    "100x": "/tmp/spark_graft_sf10",
}


def main() -> None:
    spark = get_spark(app_name="ladder_r10_sketch")
    first = spark.read.parquet(
        os.path.join(NOTCHES["1x(sf0.1)"], "lineitem.parquet")
    )
    first.groupBy("l_returnflag").agg(F.countDistinct("l_orderkey")).count()  # warm

    for notch, path in NOTCHES.items():
        li = spark.read.parquet(os.path.join(path, "lineitem.parquet"))

        t0 = time.perf_counter()
        exact = {
            r["l_returnflag"]: r["n"]
            for r in li.groupBy("l_returnflag")
            .agg(F.countDistinct("l_orderkey").alias("n"))
            .collect()
        }
        sec_exact = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        single = {
            r["l_returnflag"]: r["kmv_estimate"]
            for r in sketches.kmv_group_estimates(
                li, "l_returnflag", "l_orderkey", k=64
            ).collect()
        }
        sec_single = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        sk = sketches.kmv_merge_sketch(
            li,
            "l_returnflag",
            "l_orderkey",
            shard_col=F.pmod(F.col("l_orderkey"), F.lit(4)),
            k=64,
        )
        agg = sk.groupBy("l_returnflag").agg(
            F.count("h").alias("n_vals"), F.max("h").alias("h_k")
        )
        merged = {
            r["l_returnflag"]: r["est"]
            for r in agg.select(
                "l_returnflag",
                sketches.kmv_estimate_col(
                    F.col("n_vals"), F.col("h_k"), 64
                ).alias("est"),
            ).collect()
        }
        sec_merge = round(time.perf_counter() - t0, 3)

        max_err = max(
            abs(single[g] - exact[g]) / exact[g] for g in exact
        )
        print(
            json.dumps(
                {
                    "leg": "kmv_vs_exact",
                    "notch": notch,
                    "sec_exact_count_distinct": sec_exact,
                    "sec_kmv_single_pass": sec_single,
                    "sec_kmv_sharded_merge": sec_merge,
                    "merge_equals_single": merged == single,
                    "max_rel_err": round(max_err, 4),
                    "exact": exact,
                }
            ),
            flush=True,
        )

    spark.stop()


if __name__ == "__main__":
    main()
