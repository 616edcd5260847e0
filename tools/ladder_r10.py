#!/usr/bin/env python
"""Round-10 scale-ladder measurements.

Legs:
- SHARED SUPPORT-2 EDGE BUILD (VERDICT r9 #5): graph_part_kcore /
  graph_part_components used to rebuild the same support-2 edge list,
  and the build dominated both at 100x (25.99 s / 27.8 s in LADDER_r9
  vs live-set-sized loops).  Measure the build alone, the first
  consumer (cold: pays the build once via the session cache), and each
  subsequent consumer (warm: priced at loop cost) per notch.
- WEDGE-CAP on a power-law hub (VERDICT r9 #4): a single hub of degree
  H contributes C(H, 2) wedges to the uncapped neighbor-jaccard join;
  the capped form excludes it from wedge generation and the overflow
  audit reports it.  Uncapped comparator skipped where its intermediate
  exceeds 4e8 (same discipline as the r9 triangle ladder).
- ER NEXT DECADE (VERDICT r9 #7): resolve_entities at 15M keys on the
  duplicates-dense clustered fixture, one decade past the r9 1.5M
  measurement, with the blocking-union-only cost alongside.
- SEMDEDUP SCALE PATH: k-means-blocked semantic dedup with k = ceil(
  sqrt(n)) (the paper's regime) per notch — within-cluster pairwise is
  n^2/k, so sqrt-k keeps the join cell linear-ish in n.

Prints one JSON line per (leg, notch) with wall seconds and result rows.
Ladder fixtures: /tmp/spark_graft_sf{1,3,10} (tools/make_scaled_bench.py).
"""

from __future__ import annotations

import json
import math
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
    spark = get_spark(app_name="ladder_r10")
    from pos_pipeline_core_etl_spark import registry
    from pos_pipeline_core_etl_spark.operators import fuzzy, graph, similarity
    from pos_pipeline_core_etl_spark.plans import analytics

    qs = registry.all_queries()

    # --- shared support-2 edge build: build vs cold vs warm consumers --
    for leg in ("graph_part_kcore",):
        qs[leg](spark, "/root/testdata/sf0.001").count()  # warm the JVM
    for notch, path in NOTCHES.items():
        analytics._EDGE_CACHE.clear()
        sec_b, rows_b = _time(lambda: analytics._graph_s2_edges_build(spark, path))
        print(json.dumps({"leg": "s2_edge_build_alone", "notch": notch,
                          "sec": sec_b, "edges": rows_b}), flush=True)
        analytics._EDGE_CACHE.clear()
        sec_c, rows_c = _time(lambda: qs["graph_part_kcore"](spark, path))
        print(json.dumps({"leg": "kcore_cold_pays_build", "notch": notch,
                          "sec": sec_c, "rows": rows_c}), flush=True)
        sec_w, rows_w = _time(lambda: qs["graph_part_kcore"](spark, path))
        print(json.dumps({"leg": "kcore_warm_loop_cost", "notch": notch,
                          "sec": sec_w, "rows": rows_w}), flush=True)
        sec_m, rows_m = _time(lambda: qs["graph_part_components"](spark, path))
        print(json.dumps({"leg": "components_warm_loop_cost", "notch": notch,
                          "sec": sec_m, "rows": rows_m}), flush=True)
        sec_e, rows_e = _time(lambda: qs["graph_part_s2_edges"](spark, path))
        print(json.dumps({"leg": "s2_edges_query_warm", "notch": notch,
                          "sec": sec_e, "rows": rows_e}), flush=True)

    # --- wedge cap on a power-law hub -----------------------------------
    # hub 0 adjacent to 1..H; nodes 1..P additionally share low-degree
    # connectors so the capped form still has real work to do.
    def hub_star(h: int, connectors: int = 200):
        hub = spark.range(1, h + 1).select(
            F.lit(0).cast("long").alias("src"), F.col("id").alias("dst")
        )
        # connector c (id h+1+c) links spokes 2c+1 and 2c+2
        conn = spark.range(connectors).select(
            (F.col("id") + h + 1).alias("src"), (F.col("id") * 2 + 1).alias("dst")
        ).unionByName(
            spark.range(connectors).select(
                (F.col("id") + h + 1).alias("src"),
                (F.col("id") * 2 + 2).alias("dst"),
            )
        )
        return hub.unionByName(conn.select("src", "dst")).distinct()

    for h in (2_000, 20_000, 63_000):
        edges = hub_star(h).localCheckpoint(eager=True)
        m = edges.count()
        sec_cap, rows_cap = _time(
            lambda: graph.neighbor_jaccard_pairs(edges, threshold=0.0, wedge_cap=4)
        )
        print(json.dumps({"leg": "neighbor_jaccard_capped_hub", "hub_deg": h,
                          "edges": m, "sec": sec_cap, "rows": rows_cap}),
              flush=True)
        sec_ov, rows_ov = _time(lambda: graph.wedge_overflow(edges, wedge_cap=4))
        print(json.dumps({"leg": "wedge_overflow_hub", "hub_deg": h,
                          "sec": sec_ov, "rows": rows_ov}), flush=True)
        if h * (h - 1) // 2 <= 4 * 10**8:
            sec_un, rows_un = _time(
                lambda: graph.neighbor_jaccard_pairs(edges, threshold=0.0)
            )
            print(json.dumps({"leg": "neighbor_jaccard_uncapped_hub",
                              "hub_deg": h, "sec": sec_un, "rows": rows_un}),
                  flush=True)
        else:
            print(json.dumps({"leg": "neighbor_jaccard_uncapped_hub",
                              "hub_deg": h, "sec": None,
                              "skipped": "uncapped wedge intermediate > 4e8"}),
                  flush=True)

    # --- semdedup with k ~ sqrt(n) per notch ----------------------------
    for notch, path in NOTCHES.items():
        emb = spark.read.parquet(os.path.join(path, "embeddings.parquet"))
        n = emb.count()
        k = max(8, math.isqrt(n))
        sec_s, rows_s = _time(
            lambda: similarity.semdedup(emb, threshold=0.3, k=k, iters=2)
        )
        print(json.dumps({"leg": "semdedup_sqrtk", "notch": notch, "n_vecs": n,
                          "k": k, "sec": sec_s, "rows": rows_s}), flush=True)

    # --- ER next decade: 15M keys ---------------------------------------
    def clustered(n_clusters, members=15):
        base = (F.floor(F.col("id") / members) * 7919) % 10_000_000
        return spark.range(n_clusters * members).select(
            F.col("id").alias("c_custkey"),
            F.format_string(
                "Customer#%09d", base * 100 + F.col("id") % members
            ).alias("c_name"),
        )

    fuzzy.resolve_entities(clustered(500), "c_custkey", "c_name").count()  # warm
    for n_clusters in (100_000, 1_000_000):
        df = clustered(n_clusters)
        sec_u, rows_u = _time(
            lambda: fuzzy.union_blocking_pairs(df, "c_custkey", "c_name")
        )
        print(json.dumps({"leg": "er_union_pairs_only",
                          "keys": n_clusters * 15, "sec": sec_u,
                          "pairs": rows_u}), flush=True)
        sec_e, rows_e = _time(
            lambda: fuzzy.resolve_entities(df, "c_custkey", "c_name")
        )
        print(json.dumps({"leg": "er_resolve_entities",
                          "keys": n_clusters * 15, "sec": sec_e,
                          "rows": rows_e}), flush=True)

    spark.stop()


if __name__ == "__main__":
    main()
