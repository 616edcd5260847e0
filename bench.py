#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Headline set = the queries that dominate a real deployment: the flagship
mart pipeline, the TPC-H Q1-shape aggregation, the broadcast-join
rollup, plus a window and a dedup representative. Each timing covers the
full action (plan + execute + collect-count).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

HEADLINE = (
    "payments_daily_mart",
    "agg_pricing_summary",
    "join_broadcast_dims",
    "scan_filter_project",
    "dedup_keep_first",
    "pivot_status_by_priority",
    "sales_by_ticket_mart",
    "window_rolling_mean",
    "dedup_minhash_lsh",
    "sim_cosine_topk",
    "events_sessionization",
    "text_quality",
)


def main() -> None:
    from pos_pipeline_core_etl_spark import registry

    spark = get_spark(app_name="bench")
    queries = registry.all_queries()

    # Warmup (excluded from timings): run every headline query once at
    # the smallest SF so the JVM, parquet footers, and — dominant at
    # local scale — the whole-stage-codegen compilation cache are hot.
    # The timed runs then measure data-proportional work, matching how
    # a long-lived cluster session behaves (plans compile once).
    warm_dir = "/root/testdata/sf0.001"
    if not os.path.isdir(warm_dir):
        warm_dir = SF_DIR
    for name in HEADLINE:
        try:
            queries[name](spark, warm_dir).count()
        except Exception:
            pass  # warmup is best-effort; the timed run will surface errors

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, SF_DIR).count()
        timings[name] = round(time.perf_counter() - t0, 3)

    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    out = {
        "metric": "headline_queries_total_sec",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
