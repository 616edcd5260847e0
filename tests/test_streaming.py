"""Structured Streaming drains must equal the oracle-checked batch twin."""

from __future__ import annotations

from pos_pipeline_core_etl_spark.plans.streaming_queries import events_tumbling_counts
from pos_pipeline_core_etl_spark.streaming.events import run_streaming_tumbling_counts

SF_DIR = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(
        (str(r["window_start"]), r["event_type"], r["n"], r["total_value"])
        for r in df.collect()
    )


def test_streaming_matches_batch(spark):
    batch = events_tumbling_counts(spark, SF_DIR)
    stream = run_streaming_tumbling_counts(spark, SF_DIR, query_name="t_stream_eq")
    assert _norm(stream) == _norm(batch)
    assert len(_norm(stream)) > 0
