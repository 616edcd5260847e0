"""Central query registry: name → (spark_callable, oracle_sql | None).

The driver contract (``__spark_entry__.py``) and the local test harness
both read from here, so the set of claimed operators lives in one place.

Ordering matters: the correctness driver verifies queries in registration
order and caps the per-round list at 50.  ``_PRIORITY`` therefore rotates
per round: front-load (a) queries never driver-checked, then (b) queries
whose VALUES changed since their last driver-green row, then (c) the
oldest driver rows.  History: r1 covered the first 50 of 82; r2 the other
40 + 10 flagships; r3 rotated back to the r1-only names + the 10 new
round-3 queries; r4 front-loaded the 24 never-checked round-4 names; r7
retired the r3 backlog; r8 went 50/50 green over the r7 spillovers + the
13 new r8 queries + 28 of the 45 r4-latest names.

Round-9 window (this file).  Tier 0a = ``graph_pagerank_convergence``,
the single name never driver-checked (registered after the r8 window
froze; replica-green both SFs).  Tier 0b = the SEVENTEEN deferred
r4-latest names — note: seventeen, not the thirteen the round-8
docstring listed; the r8 list dropped four names
(``sim_lsh_bucket_topk``, ``text_decontaminate_bloom``,
``text_pack_sequences``, ``text_train_split``) that ADVICE r8 caught by
reconciling the 45−28 arithmetic — recomputed this round directly from
the CORRECTNESS_r01..r08 artifacts.  Tier 0c = the EIGHT new round-9
queries (convergence-stopped PageRank; the end-to-end
entity-resolution composition + its entity-grain recall audit; the
k-core peel over the support-2 co-purchase graph; neighborhood-Jaccard
graph near-duplicates; support-2 co-purchase components; DSIR-style
importance-resampling weights; the LR reliability/calibration table).
Tier 1a = the two de-vacuized queries whose VALUES changed
(``dedup_ngram_jaccard`` max_doc_id 100→310; ``branch_substring_filter``
re-patterned to the synthetic nation names — both were standing 0-row
greens, VERDICT r8 #2).  Tier 1b = the two graph queries whose PLAN
changed to the degree-ordered triangle join (values identical by
construction and test-pinned, but a fresh driver row beats an argument).
``fuzzy_part_pairs_union``'s oracle was refactored to share its CTE
chain with the new ER oracles — pure (replica-verified, same rows/hash),
so it keeps its D8 row and takes no slot.  Tier 2 = the 20
alphabetically-first of the 43 remaining r5-latest names (the oldest
driver rows); the other 23 r5-latest names spill to round 10, each with
a committed both-SF row in REPLICA_r9.json.  50 explicit slots exactly.
``graph_part_pagerank_seeded`` (personalized PageRank) was registered
AFTER the round-9 window filled — the graph_pagerank_convergence
precedent from round 8: it leads tier 0 in round 10 and carries
committed REPLICA_r9.json rows at both SFs meanwhile.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Round-9 window: see module docstring for the tier rationale.
_PRIORITY: tuple[str, ...] = (
    # -- tier 0a: the one never-driver-checked name ---------------------
    "graph_pagerank_convergence",
    # -- tier 0b: the 17 deferred r4-latest names (ADVICE r8: 17, not
    #    the 13 the r8 docstring listed) ---------------------------------
    "corpus_mixture_sample",
    "dedup_embedding_components",
    "emb_quantize_int8",
    "emb_random_projection",
    "events_funnel",
    "events_windowed_topk",
    "forecast_naive_lastweek",
    "sim_lsh_bucket_topk",
    "sim_lsh_buckets_histogram",
    "text_bigram_logprob",
    "text_bpe_pairs",
    "text_decontaminate_bloom",
    "text_pack_sequences",
    "text_repetition",
    "text_shuffle_shards",
    "text_train_split",
    "user_activity_gaps",
    # -- tier 0c: new round-9 queries (never driver-checked) ------------
    "graph_part_pagerank_tol",
    "fuzzy_part_entities_final",
    "fuzzy_part_entities_recall",
    "graph_part_kcore",
    "graph_part_neighbor_jaccard",
    "graph_part_components",
    "docs_dsir_weights",
    "docs_lr_calibration",
    # -- tier 1a: values changed (de-vacuized 0-row greens, VERDICT r8 #2)
    "dedup_ngram_jaccard",
    "branch_substring_filter",
    # -- tier 1b: plan swapped to the degree-ordered triangle join
    #    (values identical, re-certify anyway) ---------------------------
    "graph_part_triangles",
    "graph_part_clustering",
    # -- tier 2: the 25 alphabetically-first of the 43 remaining
    #    r5-latest names (oldest driver rows); the other 18 spill to r10 --
    "agg_pricing_summary",
    "bounded_sample",
    "corpus_dedup_report",
    "corpus_length_histogram",
    "corpus_snapshot_diff",
    "dedup_exact_docs",
    "dedup_winnow_pairs",
    "docs_quality_pct_approx",
    "docs_weighted_sample",
    "drop_null_rows",
    "emb_kmeans_lloyd",
    "emb_kmeans_sse",
    "emb_pq_codes",
    "emb_pq_sse",
    "events_cardinality_sketch",
    "events_dedup",
    "events_sessionization",
    "events_tumbling_counts",
    "fact_payments_ticket",
    "fact_sales_item_line",
)


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    # Unconditional imports: these are all first-party modules with
    # available dependencies.  A real ImportError must fail loudly, not
    # silently shrink the claimed operator surface (ADVICE r1).
    from pos_pipeline_core_etl_spark.plans import (
        analytics,
        classifier_queries,
        cleaning_queries,
        forecast_queries,
        llm_ops,
        marts,
        qa_queries,
        relational,
        streaming_queries,
        windows,
    )

    modules = [
        relational,
        marts,
        cleaning_queries,
        windows,
        qa_queries,
        llm_ops,
        classifier_queries,
        forecast_queries,
        streaming_queries,
        analytics,
    ]

    registry: dict[str, tuple[QueryFn, str | None]] = {}
    for mod in modules:
        for name, entry in mod.QUERIES.items():
            if name in registry:
                raise ValueError(f"duplicate query name {name!r}")
            fn, sql = entry
            registry[name] = (fn, sql)

    ordered: dict[str, tuple[QueryFn, str | None]] = {}
    for name in _PRIORITY:
        ordered[name] = registry.pop(name)
    ordered.update(registry)
    return ordered


def all_queries() -> dict[str, QueryFn]:
    return {name: fn for name, (fn, _sql) in _collect().items()}


def all_oracles() -> dict[str, str]:
    return {name: sql for name, (_fn, sql) in _collect().items() if sql is not None}
