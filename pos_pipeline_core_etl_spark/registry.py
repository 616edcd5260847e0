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

Round-11 window (this file).  Counts are NOT hand-written in prose —
the window is BUILT from named tier tuples, and
``tests/test_registry_meta.py::test_window_tiers_derive_from_artifacts``
re-derives every tier from the committed CORRECTNESS_r01..r10
artifacts: the never-checked tier must equal the set of registry names
absent from all pre-r11 artifacts, the re-cert tier must equal ALL
names whose latest driver row is round 6 (this closes ADVICE r10 #4 —
the four r6 names the r10 window dropped to make room for the sketch
family, ``docs_lr_train`` / ``events_layout_skipping`` /
``fn_accent_bucket`` / ``fn_clean_strings``, are re-certified here
rather than silently aging out), and the spill tier must be the
alphabetically-first names whose latest row is round 7 (the remaining
r7 names spill to round 12; every name in the registry has committed
both-SF rows in the newest REPLICA artifact regardless of window
position).

Tier rationale: never-checked = ``docs_perplexity_buckets_approx``
(new in round 11 — the percentile-sketch scale twin VERDICT r10 #5
asked for) + ``sketch_kmv_setops`` / ``sketch_hist_quantile`` /
``sketch_hist_quantile_grouped`` (round 11's sketch-family
extensions: KMV set operations and the bit-exact histogram quantile,
global and per-group).  Values-changed = empty: the round-11 sketch-shape fixes
(two-level rank pulls in ``kmv_jaccard`` / ``cms_estimates``, VERDICT
r10 #1/#2) are plan-only — outputs re-verified hash-identical at both
SFs before composing this window."""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Names never driver-checked as of the r11 window: every query new in
# round 11 (the window is recomposed before the driver runs, so new
# queries take slots from the spill tail rather than waiting a round).
_TIER_NEVER_CHECKED: tuple[str, ...] = (
    "docs_perplexity_buckets_approx",
    "sketch_hist_quantile",
    "sketch_hist_quantile_grouped",
    "sketch_kmv_setops",
)

# Queries whose VALUES changed since their last green driver row:
# none this round (the sketch-module fixes are plan-shape only and
# were re-verified hash-identical at both SFs).
_TIER_VALUES_CHANGED: tuple[str, ...] = ()

# EVERY name whose latest driver row is round 6 — the oldest remaining
# rows (recomputed from the artifacts by the meta test; this tuple
# must stay EQUAL to that set).  Includes the four names the r10
# window dropped (ADVICE r10 #4).
_TIER_RECERT_R6: tuple[str, ...] = (
    "docs_lr_train",
    "events_layout_skipping",
    "fn_accent_bucket",
    "fn_clean_strings",
    "fn_coerce_bool",
    "fn_json_extract",
    "fn_safe_unit_cost",
    "fn_to_date_multi",
    "fn_to_float_expr",
    "fn_to_float_locale",
    "fn_to_int",
    "forecast_backtest_naive",
    "forecast_loglinear",
    "fuzzy_customer_entities",
    "fuzzy_customer_overflow",
    "fuzzy_customer_pairs",
    "fuzzy_customer_recall",
    "multimodal_decode_coverage",
    "multimodal_dedup_decisions",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    "payments_daily_mart_incremental",
    "profile_lineitem",
    "qa_duplicates",
    "qa_nulls",
    "sim_ivfpq_recall",
    "text_bpe_apply",
    "text_bpe_train",
    "text_bpe_train_fast",
    "text_unigram_logprob",
)

# The alphabetically-first of the names whose latest driver row is
# round 7, filling the window to exactly 50; the rest of the r7 names
# spill to round 12.
_TIER_SPILL_R7: tuple[str, ...] = (
    "agg_count_distinct",
    "corpus_compaction_plan",
    "corpus_compaction_verify",
    "dedup_keep_first",
    "dedup_minhash_recall",
    "dedup_simhash",
    "dedup_simhash_banded",
    "dedup_simhash_recall",
    "duplicate_detection",
    "events_zorder_files",
    "events_zorder_incremental",
    "events_zorder_pruning",
    "fuzzy_customer_golden",
    "fuzzy_customer_overflow_d2",
    "fuzzy_customer_pairs_d2",
)

_PRIORITY: tuple[str, ...] = (
    _TIER_NEVER_CHECKED
    + _TIER_VALUES_CHANGED
    + _TIER_RECERT_R6
    + _TIER_SPILL_R7
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
