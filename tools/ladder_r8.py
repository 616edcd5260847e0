#!/usr/bin/env python
"""Round-8 scale-ladder measurements.

Legs:
- cluster-scoped d2 on the DENSE synthetic key fixture (the degenerate
  mode round 7 measured at 231M pairs / 1102 s for full-table d2 at
  1.5M sequential ids): d1 components first, d2 over representatives —
  the notch this composition exists to bound.  Reported next to the
  same-notch d1 cost so the composition overhead is visible.
- the phonetic blocking family and the decontamination-composed build
  on the ladder fixtures (/tmp/spark_graft_sf{1,3,10}; regenerate with
  tools/make_scaled_bench.py).

Prints one JSON line per (leg, notch) with wall seconds and result rows.
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
    spark = get_spark(app_name="ladder_r8")
    from pos_pipeline_core_etl_spark import registry
    from pos_pipeline_core_etl_spark.operators import fuzzy

    qs = registry.all_queries()

    # --- cluster-scoped d2 on the dense degenerate fixture -------------
    def names(n):
        return spark.range(n).select(
            F.col("id").alias("c_custkey"),
            F.format_string("Customer#%09d", F.col("id")).alias("c_name"),
        )

    # warm the composition once at a tiny size
    fuzzy.cluster_scoped_pairs_d2(names(1000), "c_custkey", "c_name").count()
    for n in (15_000, 150_000, 1_500_000):
        df = names(n)
        sec, rows = _time(
            lambda: fuzzy.cluster_scoped_pairs_d2(df, "c_custkey", "c_name")
        )
        print(
            json.dumps(
                {"leg": "fuzzy_d2_scoped", "keys": n, "sec": sec, "pairs": rows}
            ),
            flush=True,
        )

    # --- the DUPLICATES-dense fixture (the workload scoped d2 is FOR) --
    # Sequential ids are 1.5M DISTINCT entities packed tightly in key
    # space: their quadratic d2 pair count is TRUE output no complete
    # method can avoid, and the d1 cap excludes exactly the zero-run
    # mega-buckets that would have connected them (measured above — the
    # cap-vs-collapse tension recorded in SELFREVIEW_r8.md). Real dedup
    # density comes from VARIANTS OF THE SAME ENTITY: clusters of typo
    # variants around well-separated bases. There d1 genuinely collapses
    # each cluster and the d2 stage sees one rep per entity.
    def clustered(n_clusters, members=15):
        base = (F.floor(F.col("id") / members) * 7919) % 10_000_000
        return spark.range(n_clusters * members).select(
            F.col("id").alias("c_custkey"),
            F.format_string(
                "Customer#%09d", base * 100 + F.col("id") % members
            ).alias("c_name"),
        )

    for n_clusters in (10_000, 100_000):
        df = clustered(n_clusters)
        sec, rows = _time(
            lambda: fuzzy.cluster_scoped_pairs_d2(df, "c_custkey", "c_name")
        )
        print(
            json.dumps(
                {
                    "leg": "fuzzy_d2_scoped_clustered",
                    "keys": n_clusters * 15,
                    "sec": sec,
                    "pairs": rows,
                }
            ),
            flush=True,
        )
    # full-table d2 on the SAME clustered fixture — the composition's
    # same-fixture comparator (it must emit every within-cluster pair)
    df = clustered(100_000)
    sec, rows = _time(
        lambda: fuzzy.fuzzy_key_pairs(
            df,
            "c_custkey",
            "c_name",
            max_distance=2,
            max_bucket_size=fuzzy.FUZZY_D2_MAX_BUCKET,
        )
    )
    print(
        json.dumps(
            {"leg": "fuzzy_d2_full_clustered", "keys": 1_500_000, "sec": sec,
             "pairs": rows}
        ),
        flush=True,
    )

    # --- ladder-fixture queries ----------------------------------------
    legs = (
        "fuzzy_part_phonetic_pairs",
        "fuzzy_part_pairs_d2_scoped",
        "corpus_decon_decisions",
        "corpus_build_manifest_decon",
        "graph_part_triangles",
        "graph_part_pagerank",
    )
    for leg in legs:
        qs[leg](spark, "/root/testdata/sf0.001").count()  # warm
    for leg in legs:
        for notch, path in NOTCHES.items():
            sec, rows = _time(lambda: qs[leg](spark, path))
            print(
                json.dumps(
                    {"leg": leg, "notch": notch, "sec": sec, "rows": rows}
                ),
                flush=True,
            )

    spark.stop()


if __name__ == "__main__":
    main()
