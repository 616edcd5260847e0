#!/usr/bin/env python
"""Round-11 scale-ladder measurements.

Legs (selectable: ``python tools/ladder_r11.py er|ivfpq``):

- ER RESOLVE AT 15M KEYS (VERDICT r10 #3): the r10 ladder's 15M-key
  ``resolve_entities`` OOM'd at a 64g heap during the components rounds
  over the 238M-pair (then 476M symmetrized-row) graph.  Round 11
  reshaped ``connected_components`` memory: the edge checkpoint stays
  ORIENTED (half the persisted rows), both checkpoints store serialized
  (MEMORY_AND_DISK), and each round's label blocks are explicitly
  released once the next iterate materializes.  This leg re-runs the
  exact r10 fixture at 4.5M (comparison against r10's 2269.952 s) and
  15M keys (the notch that previously errored).
- IVFPQ TRAIN-ONCE vs QUERY-PATH (VERDICT r10 #8): the headline
  ``sim_ivfpq_kmeans_topk`` number charges full Lloyd+PQ training to
  every search.  The round-11 split API (``similarity.ivfpq_build_index``
  eager=True / ``ivfpq_query_index``) prices the two legs separately per
  notch: the train-once cost (amortized across a deployment's whole
  query stream) and the per-batch probe→ADC→refine cost, plus a second
  warm batch to show the steady-state serving cost.

Prints one JSON line per (leg, notch) with wall seconds and result rows.
ER fixtures are generated in-flight (no files); IVFPQ notches read
/root/testdata/sf0.1 and /tmp/spark_graft_sf{1,3,10}
(tools/make_scaled_bench.py).  Run the ER leg with
SPARK_GRAFT_DRIVER_MEM=64g like the r10 ladder (the fixture's pair graph
is heap-resident during the components rounds even with the r11 shape's
serialized spill path).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402

IVFPQ_NOTCHES = {
    "1x(sf0.1)": "/root/testdata/sf0.1",
    "10x": "/tmp/spark_graft_sf1",
    "30x": "/tmp/spark_graft_sf3",
    "100x": "/tmp/spark_graft_sf10",
}


def _time(fn):
    t0 = time.perf_counter()
    n = fn().count()
    return round(time.perf_counter() - t0, 3), n


def er_legs(spark) -> None:
    from pos_pipeline_core_etl_spark.operators import fuzzy

    # same clustered duplicates-dense fixture as LADDER_r9/r10: 15
    # members per cluster, base keys collide mod 1e7 so blocking
    # densifies with n exactly like the r10 run this compares against
    def clustered(n_clusters, members=15):
        base = (F.floor(F.col("id") / members) * 7919) % 10_000_000
        return spark.range(n_clusters * members).select(
            F.col("id").alias("c_custkey"),
            F.format_string(
                "Customer#%09d", base * 100 + F.col("id") % members
            ).alias("c_name"),
        )

    notches = [
        int(x)
        for x in os.environ.get(
            "LADDER_ER_CLUSTERS", "300000,1000000"
        ).split(",")
    ]
    fuzzy.resolve_entities(clustered(500), "c_custkey", "c_name").count()  # warm
    for n_clusters in notches:
        df = clustered(n_clusters)
        sec_e, rows_e = _time(
            lambda: fuzzy.resolve_entities(df, "c_custkey", "c_name")
        )
        print(json.dumps({"leg": "er_resolve_entities",
                          "keys": n_clusters * 15, "sec": sec_e,
                          "rows": rows_e,
                          "note": "r11 components memory shape; 64g driver"}),
              flush=True)


def ivfpq_legs(spark) -> None:
    from pos_pipeline_core_etl_spark.operators import similarity

    qs_warm = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    similarity.ivfpq_kmeans_search_topk(qs_warm).count()  # warm the JVM
    for notch, path in IVFPQ_NOTCHES.items():
        if not os.path.isdir(path):
            print(json.dumps({"leg": "ivfpq_split", "notch": notch,
                              "skipped": f"fixture missing: {path}"}),
                  flush=True)
            continue
        emb = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
        # train once: eager build materializes all four index frames
        t0 = time.perf_counter()
        index = similarity.ivfpq_build_index(emb, eager=True)
        n_codes = index.codes.count()  # codes already materialized; count is metadata-cheap
        sec_train = round(time.perf_counter() - t0, 3)
        print(json.dumps({"leg": "ivfpq_train_once", "notch": notch,
                          "sec": sec_train, "code_rows": n_codes}),
              flush=True)
        # query path, cold batch (first 10 self-queries — the registered
        # operating point of sim_ivfpq_kmeans_topk)
        sec_q1, rows_q1 = _time(
            lambda: similarity.ivfpq_query_index(index, k=3, n_queries=10)
        )
        print(json.dumps({"leg": "ivfpq_query_path", "notch": notch,
                          "batch": "cold", "sec": sec_q1, "rows": rows_q1}),
              flush=True)
        # second batch (steady-state serving cost; same plan, warm JVM)
        sec_q2, rows_q2 = _time(
            lambda: similarity.ivfpq_query_index(index, k=3, n_queries=10)
        )
        print(json.dumps({"leg": "ivfpq_query_path", "notch": notch,
                          "batch": "warm", "sec": sec_q2, "rows": rows_q2}),
              flush=True)
        # the pre-split composed shape, for the amortization ratio
        sec_c, rows_c = _time(
            lambda: similarity.ivfpq_kmeans_search_topk(emb)
        )
        print(json.dumps({"leg": "ivfpq_composed_oneshot", "notch": notch,
                          "sec": sec_c, "rows": rows_c}), flush=True)


def hist_legs(spark) -> None:
    """Histogram quantile vs Spark's EXACT percentile aggregate (the
    sort-based order statistic) per notch — the 'quantiles without a
    global sort' claim, priced."""
    from pyspark.sql import functions as F

    from pos_pipeline_core_etl_spark.operators import sketches

    warm = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    sketches.hist_quantiles(warm, "l_extendedprice").count()
    for notch, path in IVFPQ_NOTCHES.items():
        if not os.path.isdir(path):
            print(json.dumps({"leg": "hist_quantile", "notch": notch,
                              "skipped": f"fixture missing: {path}"}),
                  flush=True)
            continue
        li = spark.read.parquet(os.path.join(path, "lineitem.parquet"))
        t0 = time.perf_counter()
        ex = li.agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
            ).alias("q")
        ).collect()[0]["q"]
        sec_ex = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        hq = {
            r["p"]: (r["q_estimate"], r["rank_frac"])
            for r in sketches.hist_quantiles(
                li, "l_extendedprice"
            ).collect()
        }
        sec_h = round(time.perf_counter() - t0, 3)
        errs = {
            str(p): round(abs(hq[p][0] - e) / e, 5)
            for p, e in zip((0.5, 0.9, 0.99), ex)
        }
        print(json.dumps({"leg": "hist_quantile_vs_exact", "notch": notch,
                          "sec_exact_percentile": sec_ex,
                          "sec_hist_sketch": sec_h,
                          "rel_err": errs}), flush=True)
        # grouped form: per-returnflag percentiles, exact vs histogram
        t0 = time.perf_counter()
        li.groupBy("l_returnflag").agg(
            F.expr(
                "percentile(l_extendedprice, array(0.5, 0.9, 0.99))"
            ).alias("q")
        ).collect()
        sec_gex = round(time.perf_counter() - t0, 3)
        t0 = time.perf_counter()
        n_rows = sketches.hist_quantiles_grouped(
            li, "l_returnflag", "l_extendedprice"
        ).count()
        sec_gh = round(time.perf_counter() - t0, 3)
        print(json.dumps({"leg": "hist_quantile_grouped_vs_exact",
                          "notch": notch,
                          "sec_exact_grouped_percentile": sec_gex,
                          "sec_hist_grouped": sec_gh,
                          "rows": n_rows}), flush=True)


def main() -> None:
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # Short ContextCleaner period: with a 64 GiB heap the driver JVM
    # almost never GCs on its own, so shuffle files from finished
    # components rounds pile up on disk for the default 30 min — the
    # first 15M-key attempt filled the sandbox disk (~76 GB usable)
    # with ~24 rounds of multi-GB join spill before any round's files
    # were reclaimed.  2 min keeps the live spill bounded at a few
    # rounds' worth; on a real cluster the external shuffle service's
    # cleanup plays this role.
    spark = get_spark(
        app_name=f"ladder_r11_{which}",
        extra_conf={"spark.cleaner.periodicGC.interval": "2min"},
    )
    if which in ("er", "all"):
        er_legs(spark)
    if which in ("ivfpq", "all"):
        ivfpq_legs(spark)
    if which in ("hist", "all"):
        hist_legs(spark)
    spark.stop()


if __name__ == "__main__":
    main()
