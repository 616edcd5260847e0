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


def test_foreach_batch_exactly_once(spark, tmp_path):
    """foreachBatch sink: equals the batch twin; batch replay is
    idempotent; checkpointed restart writes nothing new."""
    from pyspark.sql import functions as F

    from pos_pipeline_core_etl_spark.sources.tables import load_table
    from pos_pipeline_core_etl_spark.streaming.events import (
        run_streaming_foreach_batch,
        write_batch_idempotent,
    )

    sf = "/root/testdata/sf0.001"
    out, ckpt = str(tmp_path / "sink"), str(tmp_path / "ckpt")
    src = str(tmp_path / "src")
    got = run_streaming_foreach_batch(spark, sf, out, ckpt, stream_dir=src)
    n_sink = got.count()

    expected = (
        load_table(spark, sf, "events")
        .where(F.col("value") > 0)
        .select("event_id", "ts", "user_id", "event_type", "value")
    )
    assert n_sink == expected.count()
    assert got.select(F.sum("event_id")).first()[0] == expected.select(F.sum("event_id")).first()[0]

    # replaying an already-written batch overwrites, never duplicates
    # (materialized first — a real replay re-reads the SOURCE, not the sink)
    replay_rows = got.where(F.col("batch_id") == 0).drop("batch_id").collect()
    batch0 = spark.createDataFrame(
        replay_rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
    )
    write_batch_idempotent(batch0, 0, out)
    assert spark.read.option("basePath", out).parquet(out + "/batch_id=*").count() == n_sink

    # restart with the same checkpoint: source exhausted, sink unchanged
    again = run_streaming_foreach_batch(spark, sf, out, ckpt, stream_dir=src)
    assert again.count() == n_sink


def test_stream_dir_relinks_on_sf_change(spark, tmp_path):
    """Reusing a stream_dir across scale factors must re-point the
    symlink at the new source, not silently stream stale data (ADVICE r1)."""
    import os

    from pos_pipeline_core_etl_spark.streaming.events import read_events_stream

    d = str(tmp_path / "stream")
    read_events_stream(spark, "/root/testdata/sf0.001", stream_dir=d)
    link = os.path.join(d, "events.parquet")
    assert os.readlink(link) == "/root/testdata/sf0.001/events.parquet"
    read_events_stream(spark, "/root/testdata/sf0.01", stream_dir=d)
    assert os.readlink(link) == "/root/testdata/sf0.01/events.parquet"


def test_streaming_dedup_matches_batch(spark):
    """dropDuplicatesWithinWatermark over a duplicate-injected stream ≡
    batch distinct (the at-least-once ingestion guard, §2.10)."""
    from pos_pipeline_core_etl_spark.sources.tables import load_table
    from pos_pipeline_core_etl_spark.streaming.events import (
        dedup_batch,
        run_streaming_dedup,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["event_id"], r["event_type"], r["value"])
        for r in run_streaming_dedup(spark, sf, query_name="t_dedup_eq").collect()
    }
    want = {
        (r["event_id"], r["event_type"], r["value"])
        for r in dedup_batch(load_table(spark, sf, "events")).collect()
    }
    assert got == want and len(got) > 0


def test_stream_stream_join_matches_batch(spark):
    """Watermarked stream-stream attribution join (purchases × preceding
    views per user) ≡ the batch range join over the drained source."""
    from pos_pipeline_core_etl_spark.sources.tables import load_table
    from pos_pipeline_core_etl_spark.streaming.events import (
        purchase_view_join_batch,
        run_streaming_purchase_view_join,
    )

    sf = "/root/testdata/sf0.001"
    got = {
        (r["purchase_id"], r["view_id"], r["p_user"], r["purchase_value"])
        for r in run_streaming_purchase_view_join(
            spark, sf, query_name="t_ssjoin_eq"
        ).collect()
    }
    want = {
        (r["purchase_id"], r["view_id"], r["p_user"], r["purchase_value"])
        for r in purchase_view_join_batch(load_table(spark, sf, "events")).collect()
    }
    assert got == want and len(got) > 0
