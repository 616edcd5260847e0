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

Round-12 window (this file).  Counts are NOT hand-written in prose —
the window is BUILT from named tier tuples, and
``tests/test_registry_meta.py::test_window_tiers_derive_from_artifacts``
re-derives every tier from the committed CORRECTNESS_r01..r11
artifacts: the never-checked tier must equal the set of registry names
absent from all pre-r12 artifacts, the re-cert tier must equal ALL
names whose latest driver row is round 7 (VERDICT r11 #3 — the 35
r7-era rows are the oldest in the union and the r11 plan already
promised them this window; none may silently age out), and the spill
tier must be the alphabetically-first names whose latest row is round
8, filling the window to exactly 50 (the remaining r8 names spill to
round 13; every name in the registry has committed both-SF rows in
the newest REPLICA artifact regardless of window position).

Tier rationale: never-checked = ``sim_ivfpq_query_only`` (new in
round 12 — the IVF-PQ serving path against a prebuilt eager index,
VERDICT r11 #7) + ``sketch_hist_fixed_grouped`` (round 12 — the
per-group fixed-bound counter table, i.e. the streaming maintainer's
mergeable state of VERDICT r11 #8, checked cell-for-cell) +
``sketch_priority_sample`` (round 12 — the weighted sampling sketch:
Duffield-Lund-Thorup priority sampling with the sharded-rank
mergeability proof) + ``sketch_bloom_merge`` / ``sketch_bloom_semijoin``
(round 12 — the Bloom membership filter: shard-built OR-merged word
table checked bit-for-bit, and the semi-join pruning audit reporting
per-segment false-positive rates in both the properly-sized and the
saturated regime) + ``events_rollup_cascade`` (round 12 — the
hypertable-style minute→hour→day cascading rollup with a mergeable KMV
distinct-users leg, proven against a direct-from-raw day-grain
oracle) + ``sketch_cms_grouped`` (round 12 — per-group Count-Min
heavy hitters, completing the grouped sketch forms; no forced
broadcast of the group-scaled counter state) +
``sketch_priority_grouped`` (round 12 — the stratified weighted
sampler: one DLT summary per group from a partitioned-window
top-(k+1)) + ``events_mad_anomalies_hist`` (round 12 — the
histogram-sketch median/MAD robust scorer, closing the approx-swap
promise in the exact twin's docstring with a bit-exact oracle instead
of a tolerance envelope).  Values-changed = empty: the round-12 kmv_setops
empty-input guard and the grouped-histogram broadcast-hint removal
(VERDICT r11 #1, ADVICE r11 #1) change NO values on the registered
domains — re-verified hash-identical at sf0.01 before composing this
window."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Names never driver-checked as of the r12 window: the one query new
# in round 12 (the window is recomposed before the driver runs, so new
# queries take slots from the spill tail rather than waiting a round).
_TIER_NEVER_CHECKED: tuple[str, ...] = (
    "sim_ivfpq_query_only",
    "sketch_hist_fixed_grouped",
    "sketch_priority_sample",
    "sketch_bloom_merge",
    "sketch_bloom_semijoin",
    "events_rollup_cascade",
    "sketch_cms_grouped",
    "sketch_priority_grouped",
    "events_mad_anomalies_hist",
)

# Queries whose VALUES changed since their last green driver row:
# none this round (the r12 kmv_setops empty-input guard and the
# grouped-histogram hint removal are value-neutral on the registered
# domains — re-verified hash-identical at sf0.01).
_TIER_VALUES_CHANGED: tuple[str, ...] = ()

# EVERY name whose latest driver row is round 7 — the oldest remaining
# rows (recomputed from the artifacts by the meta test; this tuple
# must stay EQUAL to that set).  The r11 window spilled these here
# (VERDICT r11 #3).
_TIER_RECERT_R7: tuple[str, ...] = (
    "fuzzy_customer_recall_d2",
    "fuzzy_customer_sn2_recall",
    "fuzzy_customer_sn_recall",
    "fuzzy_customer_sorted_pairs",
    "grand_totals_rollup",
    "horizontal_sum",
    "join_bigbig_revenue",
    "join_broadcast_dims",
    "join_left_flag",
    "join_validity_window",
    "join_validity_window_bucketed",
    "monthly_rollup",
    "pivot_status_by_priority",
    "qa_missing_days",
    "qa_monthly_sales",
    "qa_non_negative",
    "qa_per_sucursal_ranges",
    "qa_revenue_consistency",
    "qa_sample_months",
    "qa_zero_method_flags",
    "qa_zscore_anomalies",
    "scan_filter_project",
    "set_except_keys",
    "sim_ivfpq_kmeans_recall",
    "sim_ivfpq_kmeans_topk",
    "sim_ivfpq_recall_sweep",
    "skew_profile_events",
    "stratified_sample",
    "text_chunk_windows",
    "text_decontaminate_fuzzy",
    "topk_orders",
    "topk_per_group",
    "union_by_name",
    "unpivot_measures",
    "value_mode",
)

# The alphabetically-first of the names whose latest driver row is
# round 8, filling the window to exactly 50; the rest of the r8 names
# spill to round 13.
_TIER_SPILL_R8: tuple[str, ...] = (
    "calendar_zero_fill",
    "corpus_build_manifest_decon",
    "corpus_decon_decisions",
    "corpus_drift_report",
    "corpus_mixture_plan",
    "corpus_prep_decisions",
)

_PRIORITY: tuple[str, ...] = (
    _TIER_NEVER_CHECKED
    + _TIER_VALUES_CHANGED
    + _TIER_RECERT_R7
    + _TIER_SPILL_R8
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
