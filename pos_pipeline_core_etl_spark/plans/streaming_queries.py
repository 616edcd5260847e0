"""Batch twins of the streaming queries, oracle-checked (SURVEY §2.10).

Spark's ``window()``/``session_window()`` batch semantics are identical
to their streaming semantics for a fully-drained source, so these twins
both validate the operator logic and serve as the ground truth the
streaming tests compare against.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround_sql
from pos_pipeline_core_etl_spark.sources.tables import load_table
from pos_pipeline_core_etl_spark.streaming.events import (
    sessionize_batch,
    tumbling_counts_batch,
)


def events_tumbling_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    return tumbling_counts_batch(load_table(spark, sf_dir, "events"))


EVENTS_TUMBLING_COUNTS_SQL = f"""
SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
       event_type,
       COUNT(*) AS n,
       {hround_sql("SUM(value)", 2)} AS total_value
FROM events
GROUP BY 1, 2
"""


def events_sessionization(spark: SparkSession, sf_dir: str) -> DataFrame:
    return sessionize_batch(load_table(spark, sf_dir, "events"))


EVENTS_SESSIONIZATION_SQL = f"""
WITH flagged AS (
  SELECT user_id, ts, value,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts)
                   > INTERVAL '30 minutes'
              OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
),
sessions AS (
  SELECT user_id, ts, value,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT MIN(ts) AS session_start, user_id,
       COUNT(*) AS n_events,
       {hround_sql("SUM(value)", 2)} AS total_value
FROM sessions
GROUP BY user_id, sid
"""


QUERIES: dict[str, tuple] = {
    "events_tumbling_counts": (events_tumbling_counts, EVENTS_TUMBLING_COUNTS_SQL),
    "events_sessionization": (events_sessionization, EVENTS_SESSIONIZATION_SQL),
}


def events_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of the streaming dropDuplicatesWithinWatermark dedup."""
    from pos_pipeline_core_etl_spark.streaming.events import dedup_batch

    return dedup_batch(load_table(spark, sf_dir, "events"))


EVENTS_DEDUP_SQL = f"""
SELECT DISTINCT event_id, event_type, {hround_sql("value", 2)} AS value
FROM (SELECT * FROM events UNION ALL SELECT * FROM events)
"""


QUERIES["events_dedup"] = (events_dedup, EVENTS_DEDUP_SQL)
