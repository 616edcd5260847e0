#!/usr/bin/env python
"""Round-9 scale-ladder measurements.

Legs:
- PLAIN vs DEGREE-ORDERED triangle counting on a synthetic hub graph
  whose hubs sit MID-WAY in the id order — the shape where the plain
  ordered a<b<c join's intermediate goes quadratic (sum over hubs of
  below-ids x above-ids) while the oriented wedge join stays bounded at
  sum C(outdeg+, 2) (hubs get oriented out-degree ~0).  Both forms are
  also run on the dim-bounded co-purchase fixture where they tie.
- the END-TO-END entity-resolution composition (resolve_entities) on
  the duplicates-dense clustered fixture from ladder_r8, next to its
  one-shot full-d2 comparator and the blocking-union-only cost, so the
  overhead of the two component passes + the rep-level d2 residual is
  visible per notch.
- the convergence-stopped PageRank (graph_part_pagerank_tol) on the
  ladder fixtures next to the fixed-10 form: the stop rule's bounded
  scalar per iteration vs the fixed count, at every notch.

Prints one JSON line per (leg, notch) with wall seconds and result rows.
Ladder fixtures: /tmp/spark_graft_sf{1,3,10} (tools/make_scaled_bench.py).
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
    spark = get_spark(app_name="ladder_r9")
    from pos_pipeline_core_etl_spark import registry
    from pos_pipeline_core_etl_spark.operators import fuzzy, graph

    qs = registry.all_queries()

    # --- triangle join geometry: hub graph, hubs mid-way in id order ---
    # n_hubs hubs, each adjacent to spokes/2 ids BELOW and spokes/2 ids
    # ABOVE its own id, plus a ring of background edges that closes real
    # triangles.  Plain intermediate ~ n_hubs * (spokes/2)^2 wedge
    # candidates THROUGH each hub id; oriented: every spoke edge points
    # AT the hub (max degree), so hubs contribute zero wedges.
    def hub_graph(n_hubs: int, spokes: int):
        n_nodes = n_hubs * (spokes + 1) + spokes
        hubs = spark.range(n_hubs).select(
            (F.col("id") * (spokes + 1) + spokes // 2 + 1).alias("hub")
        )
        lo = hubs.join(
            spark.range(spokes // 2).withColumnRenamed("id", "k"), how="cross"
        ).select(
            (F.col("hub") - F.col("k") - 1).alias("src"), F.col("hub").alias("dst")
        )
        hi = hubs.join(
            spark.range(spokes // 2).withColumnRenamed("id", "k"), how="cross"
        ).select(
            F.col("hub").alias("src"), (F.col("hub") + F.col("k") + 1).alias("dst")
        )
        ring = spark.range(n_nodes - 1).select(
            F.col("id").alias("src"), (F.col("id") + 1).alias("dst")
        )
        return lo.unionByName(hi).unionByName(ring).distinct()

    for n_hubs, spokes in ((4, 2_000), (8, 6_000), (8, 20_000)):
        edges = hub_graph(n_hubs, spokes).localCheckpoint(eager=True)
        m = edges.count()
        sec_o, rows_o = _time(lambda: graph.triangle_counts_oriented(edges))
        rec = {
            "leg": "triangles_oriented_hub",
            "hubs": n_hubs,
            "spokes": spokes,
            "edges": m,
            "sec": sec_o,
            "rows": rows_o,
        }
        print(json.dumps(rec), flush=True)
        # the plain form's wedge intermediate is n_hubs*(spokes/2)^2;
        # cap the comparator at the notch where that is still feasible
        if n_hubs * (spokes // 2) ** 2 <= 4 * 10**8:
            sec_p, rows_p = _time(lambda: graph.triangle_counts(edges))
            assert rows_p == rows_o, (rows_p, rows_o)
            rec = dict(rec, leg="triangles_plain_hub", sec=sec_p)
            print(json.dumps(rec), flush=True)
        else:
            print(
                json.dumps(
                    {
                        "leg": "triangles_plain_hub",
                        "hubs": n_hubs,
                        "spokes": spokes,
                        "edges": m,
                        "sec": None,
                        "skipped": "plain wedge intermediate > 4e8 rows",
                    }
                ),
                flush=True,
            )

    # --- end-to-end ER on the duplicates-dense clustered fixture -------
    def clustered(n_clusters, members=15):
        base = (F.floor(F.col("id") / members) * 7919) % 10_000_000
        return spark.range(n_clusters * members).select(
            F.col("id").alias("c_custkey"),
            F.format_string(
                "Customer#%09d", base * 100 + F.col("id") % members
            ).alias("c_name"),
        )

    fuzzy.resolve_entities(clustered(500), "c_custkey", "c_name").count()  # warm
    for n_clusters in (10_000, 100_000):
        df = clustered(n_clusters)
        sec_u, rows_u = _time(
            lambda: fuzzy.union_blocking_pairs(df, "c_custkey", "c_name")
        )
        print(
            json.dumps(
                {
                    "leg": "er_union_pairs_only",
                    "keys": n_clusters * 15,
                    "sec": sec_u,
                    "pairs": rows_u,
                }
            ),
            flush=True,
        )
        sec_e, rows_e = _time(
            lambda: fuzzy.resolve_entities(df, "c_custkey", "c_name")
        )
        print(
            json.dumps(
                {
                    "leg": "er_resolve_entities",
                    "keys": n_clusters * 15,
                    "sec": sec_e,
                    "rows": rows_e,
                }
            ),
            flush=True,
        )

    # --- convergence-stopped PageRank on the ladder fixtures -----------
    legs = (
        "graph_part_pagerank",
        "graph_part_pagerank_tol",
        "graph_part_triangles",
        "graph_part_kcore",
        "graph_part_neighbor_jaccard",
        "fuzzy_part_entities_final",
        "fuzzy_part_entities_recall",
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
