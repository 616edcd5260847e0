#!/usr/bin/env python
"""Round-12 scale-ladder, rollup leg: SERVING COST vs RAW SIZE.

The continuous-aggregate claim in numbers: once the fine (hour) grain
is materialized, answering the day grain re-aggregates a CELLS-sized
table — flat as the raw event count grows — while the naive path
re-scans raw every time.  Legs: raw ∈ {1M, 8M, 32M} synthetic events
over a fixed 30-day × 5-type × 24-hour cell domain (3 600 hour cells);
per leg we record

  - materialize_sec: build + checkpoint the hour grain (paid once per
    ingest window — the amortized cost);
  - serve_from_rollup_sec: day grain FROM the 3 600-row hour table;
  - serve_from_raw_sec: day grain straight from raw (the re-scan the
    rollup exists to avoid);
  - a cell-count check that both paths agree on n_events totals.

Expect: serve_from_rollup flat (ms — input is 3 600 rows at every
notch), serve_from_raw growing with raw, materialize linear in raw.
Run idle:  python tools/ladder_r12_rollup.py | tee -a LADDER_r12.jsonl
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from pos_pipeline_core_etl_spark.session import get_spark  # noqa: E402

NOTCHES = [1_000_000, 8_000_000, 32_000_000]
BASE = 1_709_251_200  # 2024-03-01 00:00:00 UTC


def synth(spark, n):
    # 30 days x 24 hours x 5 types; ts uniform over the month
    return (
        spark.range(n)
        .select(
            F.timestamp_seconds(
                F.lit(BASE) + (F.col("id") * 977) % (30 * 86_400)
            ).alias("ts"),
            F.concat(F.lit("t"), (F.col("id") % 5).cast("string")).alias(
                "event_type"
            ),
            ((F.col("id") * 13) % 1_000).cast("double").alias("value"),
        )
        .repartition(32)
    )


def main() -> None:
    spark = get_spark(app_name="ladder_r12_rollup")
    spark.sparkContext.setLogLevel("ERROR")

    for n in NOTCHES:
        ev = synth(spark, n).localCheckpoint(eager=True)

        t0 = time.perf_counter()
        hour = (
            ev.groupBy(
                F.date_trunc("hour", "ts").alias("hour"), "event_type"
            )
            .agg(F.count("*").alias("cnt"), F.sum("value").alias("sv"))
            .localCheckpoint(eager=True)
        )
        mat_sec = round(time.perf_counter() - t0, 3)
        n_hour_cells = hour.count()

        t0 = time.perf_counter()
        from_rollup = (
            hour.groupBy(F.to_date("hour").alias("day"), "event_type")
            .agg(F.sum("cnt").alias("n_events"), F.sum("sv").alias("sv"))
        )
        rollup_total = from_rollup.agg(F.sum("n_events")).collect()[0][0]
        rollup_sec = round(time.perf_counter() - t0, 3)

        t0 = time.perf_counter()
        from_raw = (
            ev.groupBy(F.to_date("ts").alias("day"), "event_type")
            .agg(F.count("*").alias("n_events"), F.sum("value").alias("sv"))
        )
        raw_total = from_raw.agg(F.sum("n_events")).collect()[0][0]
        raw_sec = round(time.perf_counter() - t0, 3)

        assert rollup_total == raw_total == n, (rollup_total, raw_total, n)
        print(
            json.dumps(
                {
                    "leg": "rollup_serving_vs_raw",
                    "raw_rows": n,
                    "hour_cells": n_hour_cells,
                    "materialize_sec": mat_sec,
                    "serve_from_rollup_sec": rollup_sec,
                    "serve_from_raw_sec": raw_sec,
                }
            ),
            flush=True,
        )
        hour.unpersist()
        ev.unpersist()

    spark.stop()


if __name__ == "__main__":
    main()
