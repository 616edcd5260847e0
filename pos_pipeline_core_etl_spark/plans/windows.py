"""Window / calendar queries (SURVEY §2.6, §2.13 prep-ops coverage).

- ``calendar_zero_fill``: the forecasting input builder
  (``forecasting/data/preparation.py:12-39`` — ``reindex(date_range,
  fill_value=0)``) re-expressed distributively: per-branch
  ``sequence()`` + ``explode`` + left join + ``coalesce(0)``.
- ``window_rolling_mean``: trailing 7-row moving average per branch.
- ``window_lag_delta``: day-over-day delta via ``lag`` over the
  densified series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround, hround_sql
from pos_pipeline_core_etl_spark.operators import qa
from pos_pipeline_core_etl_spark.plans.marts import PAYMENTS_DAILY_MART_SQL, payments_daily_mart

_MART_CTE = f"WITH mart AS ({PAYMENTS_DAILY_MART_SQL})"
_IT = "(" + " + ".join(qa.INGRESO_COLS) + ")"


def build_daily_series(mart: DataFrame) -> DataFrame:
    """Zero-filled daily revenue series per branch (densified calendar)."""
    ranges = mart.groupBy("sucursal").agg(
        F.min("fecha").alias("d0"), F.max("fecha").alias("d1")
    )
    calendar = ranges.select(
        "sucursal",
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("fecha"),
    )
    daily = mart.select(
        "sucursal", "fecha", hround(qa.ingreso_total_col(), 2).alias("it")
    )
    return (
        calendar.join(daily, ["sucursal", "fecha"], "left")
        .select(
            "sucursal",
            "fecha",
            F.coalesce(F.col("it"), F.lit(0.0)).alias("ingreso_total"),
        )
    )


_DAILY_SERIES_SQL_BODY = f"""
r AS (SELECT sucursal, MIN(fecha) AS d0, MAX(fecha) AS d1 FROM mart GROUP BY sucursal),
cal AS (
  SELECT r.sucursal, CAST(u.d AS DATE) AS fecha
  FROM r, LATERAL (SELECT unnest(generate_series(r.d0, r.d1, INTERVAL 1 DAY)) AS d) u
),
daily AS (SELECT sucursal, fecha, {hround_sql(_IT, 2)} AS it FROM mart),
series AS (
  SELECT c.sucursal, c.fecha, COALESCE(d.it, 0.0) AS ingreso_total
  FROM cal c LEFT JOIN daily d ON c.sucursal = d.sucursal AND c.fecha = d.fecha
)
"""


def calendar_zero_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_daily_series(payments_daily_mart(spark, sf_dir))


CALENDAR_ZERO_FILL_SQL = f"""
{_MART_CTE},
{_DAILY_SERIES_SQL_BODY}
SELECT * FROM series
"""


def window_rolling_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = calendar_zero_fill(spark, sf_dir)
    w = (
        Window.partitionBy("sucursal")
        .orderBy("fecha")
        .rowsBetween(-6, Window.currentRow)
    )
    return series.withColumn("ma7", hround(F.avg("ingreso_total").over(w), 4))


WINDOW_ROLLING_MEAN_SQL = f"""
{_MART_CTE},
{_DAILY_SERIES_SQL_BODY}
SELECT sucursal, fecha, ingreso_total,
       {hround_sql("AVG(ingreso_total) OVER (PARTITION BY sucursal ORDER BY fecha ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)", 4)} AS ma7
FROM series
"""


def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    series = calendar_zero_fill(spark, sf_dir)
    w = Window.partitionBy("sucursal").orderBy("fecha")
    return series.withColumn(
        "delta", hround(F.col("ingreso_total") - F.lag("ingreso_total", 1).over(w), 2)
    )


WINDOW_LAG_DELTA_SQL = f"""
{_MART_CTE},
{_DAILY_SERIES_SQL_BODY}
SELECT sucursal, fecha, ingreso_total,
       {hround_sql("ingreso_total - LAG(ingreso_total, 1) OVER (PARTITION BY sucursal ORDER BY fecha)", 2)} AS delta
FROM series
"""


QUERIES: dict[str, tuple] = {
    "calendar_zero_fill": (calendar_zero_fill, CALENDAR_ZERO_FILL_SQL),
    "window_rolling_mean": (window_rolling_mean, WINDOW_ROLLING_MEAN_SQL),
    "window_lag_delta": (window_lag_delta, WINDOW_LAG_DELTA_SQL),
}
