#!/usr/bin/env python
"""Round-7 scale-ladder measurements: the new operators at 10x/30x/100x
(ladder fixtures in /tmp/spark_graft_sf{1,3,10}; regenerate with
tools/make_scaled_bench.py). The fuzzy d=1/d=2 legs synthesize scaled
key tables (the ladder fixtures keep customer dim-sized), using the
same TPC-H name shape so the variant statistics match the fixture.

Prints one JSON line per (query, notch) with wall seconds and result
rows. Warm: each leg runs once untimed at the smallest notch first.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402

NOTCHES = {
    "1x(sf0.1)": "/root/testdata/sf0.1",
    "10x": "/tmp/spark_graft_sf1",
    "30x": "/tmp/spark_graft_sf3",
    "100x": "/tmp/spark_graft_sf10",
}


def _time(fn):
    t0 = time.perf_counter()
    n = fn().count()
    return round(time.perf_counter() - t0, 3), n


def main() -> None:
    spark = get_spark(app_name="ladder_r7")
    from pos_pipeline_core_etl_spark import registry
    from pos_pipeline_core_etl_spark.operators import fuzzy

    qs = registry.all_queries()

    # --- fuzzy d1 vs d2 on synthetic scaled key tables ----------------
    def names(n):
        return spark.range(n).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        )

    for n in (15_000, 150_000, 1_500_000):
        for dist, cap in ((1, fuzzy.FUZZY_MAX_BUCKET), (2, fuzzy.FUZZY_D2_MAX_BUCKET)):
            df = names(n)
            sec, rows = _time(
                lambda: fuzzy.fuzzy_key_pairs(
                    df, "c_custkey", "c_name", max_distance=dist,
                    max_bucket_size=cap,
                )
            )
            print(json.dumps({
                "leg": f"fuzzy_d{dist}", "keys": n, "sec": sec, "pairs": rows,
            }), flush=True)

    # --- ladder-fixture queries ----------------------------------------
    legs = (
        "text_decontaminate_fuzzy",
        "corpus_compaction_plan",
        "events_zorder_files",
        "events_zorder_pruning",
        "sim_ivfpq_recall_sweep",
    )
    # warm once at the smallest notch
    for leg in legs:
        qs[leg](spark, "/root/testdata/sf0.001").count()
    for leg in legs:
        for notch, path in NOTCHES.items():
            sec, rows = _time(lambda: qs[leg](spark, path))
            print(json.dumps({
                "leg": leg, "notch": notch, "sec": sec, "rows": rows,
            }), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
