"""Always-on streaming representative for the default (fast) suite.

tests/test_streaming.py is marked ``slow`` wholesale — its availableNow
drains cost ~400 s (VERDICT r12 #2) — so this ONE cheap stream-equals-
batch check keeps the streaming entry path covered in every default
run: source wiring, micro-batch execution, and the batch-equivalence
contract of the simplest maintainer.
"""

from __future__ import annotations

from pos_pipeline_core_etl_spark.plans.streaming_queries import events_tumbling_counts
from pos_pipeline_core_etl_spark.streaming.events import run_streaming_tumbling_counts

SF_DIR = "/root/testdata/sf0.001"


def _norm(df):
    return sorted(
        (str(r["window_start"]), r["event_type"], r["n"], r["total_value"])
        for r in df.collect()
    )


def test_streaming_smoke_matches_batch(spark):
    batch = events_tumbling_counts(spark, SF_DIR)
    stream = run_streaming_tumbling_counts(
        spark, SF_DIR, query_name="t_stream_smoke"
    )
    got = _norm(stream)
    assert got == _norm(batch)
    assert len(got) > 0
