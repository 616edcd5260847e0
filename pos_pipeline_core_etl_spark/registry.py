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

Round-10 window (this file).  Counts are NO LONGER hand-written in
prose — three rounds in a row a count drifted from the list (r8's
13-vs-17, r9's tier-2 comment, SELFREVIEW_r9's stale arithmetic), and
window composition is exactly where a silent arithmetic slip costs a
round of driver coverage (VERDICT r9 #2).  The window is now BUILT from
named tier tuples, and ``tests/test_registry_meta.py::
test_window_tiers_derive_from_artifacts`` re-derives every tier from
the committed CORRECTNESS_r01..r09 artifacts: the never-checked tier
must equal the set of registry names absent from all pre-r10 artifacts,
the rotation tier must equal ALL names whose latest driver row is round
5, and the re-cert tier must be the alphabetically-first names whose
latest row is round 6 (the remaining r6 names spill to round 11, each
with committed both-SF rows in REPLICA_r10.json).

Tier rationale: never-checked = ``graph_part_pagerank_seeded``
(registered after the r9 window froze — the standing precedent) plus
the new round-10 queries (the shared support-2 edge materialization,
the wedge-capped jaccard + its overflow audit closing VERDICT r9 #4,
SemDeDup, CCNet perplexity buckets, and the deterministic mergeable-
sketch family: KMV distinct / sharded-merge / Jaccard + Count-Min
top-k, ``plans/sketch_queries.py``).  Values-changed =
``dedup_ngram_jaccard`` (max_doc_id 310→800: the r9 bound was vacuous
at sf0.1 — ADVICE r9 #1).  Then the r5-latest rotation and the oldest
r6 re-certs."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Names never driver-checked as of the r10 window: the post-r9-window
# registration + every query new in round 10 (including the mergeable-
# sketch family added mid-round — the window is recomposed before the
# driver runs, so new queries take slots from the r6 re-cert tail
# rather than waiting a round).
_TIER_NEVER_CHECKED: tuple[str, ...] = (
    "graph_part_pagerank_seeded",
    "graph_part_s2_edges",
    "graph_part_neighbor_jaccard_capped",
    "graph_part_wedge_overflow",
    "docs_semdedup",
    "docs_perplexity_buckets",
    "sketch_kmv_distinct",
    "sketch_kmv_merge",
    "sketch_kmv_jaccard",
    "sketch_cms_topk",
)

# Queries whose VALUES changed since their last green driver row.
_TIER_VALUES_CHANGED: tuple[str, ...] = (
    "dedup_ngram_jaccard",  # max_doc_id 310 -> 800 (ADVICE r9 #1)
)

# Every name whose latest driver row is round 5 (recomputed from the
# artifacts by the meta test — this tuple must stay EQUAL to that set).
_TIER_ROTATE_R5: tuple[str, ...] = (
    "fact_transfers_line",
    "multimodal_dhash",
    "multimodal_dhash_pairs",
    "order_times_approx",
    "order_times_summary",
    "sales_by_group_mart",
    "silver_clean_payments",
    "sim_ivfpq_topk",
    "sim_pq_adc_topk",
    "sorted_distinct_dates",
    "sql_interface_revenue",
    "text_decontaminate",
    "text_dedup_spans",
    "text_fingerprint",
    "text_lang_id",
    "text_pii_scan",
    "text_quality",
    "text_substring_dedup",
    "text_tfidf_topk",
    "text_token_counts",
    "text_vocabulary",
    "text_winnow_fingerprints",
    "transfers_cube_mart",
)

# The alphabetically-first of the names whose latest driver row is
# round 6 (the oldest remaining rows), filling the window to exactly
# 50; the rest of the r6 names spill to round 11.
_TIER_RECERT_R6: tuple[str, ...] = (
    "corpus_build_manifest",
    "corpus_lr_gate",
    "dedup_contained_docs",
    "dedup_containment",
    "dedup_containment_overflow",
    "dedup_containment_recall",
    "dedup_containment_staged",
    "dedup_incremental_diff",
    "dedup_simhash_overflow",
    "dedup_simhash_staged",
    "dedup_sparse_cosine",
    "dedup_sparse_cosine_staged",
    "deposit_cash_flow",
    "docs_lr_auc",
    "docs_lr_eval",
    "docs_lr_scores",
)

_PRIORITY: tuple[str, ...] = (
    _TIER_NEVER_CHECKED
    + _TIER_VALUES_CHANGED
    + _TIER_ROTATE_R5
    + _TIER_RECERT_R6
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
        sketch_queries,
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
        sketch_queries,
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
