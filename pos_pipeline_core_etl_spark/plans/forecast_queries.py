"""Forecasting queries (SURVEY §2.13) with oracles where SQL-expressible.

- ``forecast_naive_lastweek``: the NaiveLastWeek model expressed as a
  pure relational plan (same-weekday lookback join + rank) — fully
  oracle-checked.
- ``forecast_deposit_schedule``: banking-calendar deposit rollup —
  oracle-checked.
- ``forecast_loglinear``: applyInPandas model fitting (numpy OLS per
  branch × metric) — not SQL-expressible; rows-only check + unit tests.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.forecasting.deposit import (
    CARD_DEPOSIT_SQL,
    CASH_DEPOSIT_SQL,
    build_deposit_schedule,
)
from pos_pipeline_core_etl_spark.functions.rounding import hround, hround_sql
from pos_pipeline_core_etl_spark.operators import qa
from pos_pipeline_core_etl_spark.plans.marts import PAYMENTS_DAILY_MART_SQL, payments_daily_mart

_MART_CTE = f"WITH mart AS ({PAYMENTS_DAILY_MART_SQL})"
_IT = "(" + " + ".join(qa.INGRESO_COLS) + ")"

NAIVE_MAX_WEEKS = 8
HORIZON = 7


def forecast_naive_lastweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per branch: next 7 days = most recent same-weekday observed value
    within 8 weeks (else 0). One broadcastable horizon frame + a rank
    window — no Python, no loop."""
    mart = payments_daily_mart(spark, sf_dir)
    daily = mart.select(
        "sucursal", "fecha", hround(qa.ingreso_total_col(), 2).alias("it")
    )
    last = daily.groupBy("sucursal").agg(F.max("fecha").alias("last_fecha"))
    horizon = last.select(
        "sucursal",
        F.explode(F.sequence(F.lit(1), F.lit(HORIZON))).alias("h"),
        "last_fecha",
    ).select(
        "sucursal", "h", F.expr("date_add(last_fecha, h)").alias("target_fecha")
    )
    cand = horizon.join(
        daily.select(F.col("sucursal").alias("c_suc"), F.col("fecha").alias("c_fecha"), "it"),
        (F.col("sucursal") == F.col("c_suc"))
        & (F.dayofweek("c_fecha") == F.dayofweek("target_fecha"))
        & (F.col("c_fecha") < F.col("target_fecha"))
        & (F.col("c_fecha") >= F.date_sub(F.col("target_fecha"), 7 * NAIVE_MAX_WEEKS)),
        "left",
    )
    w = Window.partitionBy("sucursal", "h").orderBy(F.col("c_fecha").desc_nulls_last())
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") == 1)
        .select(
            "sucursal",
            F.col("h").cast("long").alias("h"),
            "target_fecha",
            F.coalesce(F.col("it"), F.lit(0.0)).alias("valor"),
        )
    )


FORECAST_NAIVE_LASTWEEK_SQL = f"""
{_MART_CTE},
daily AS (SELECT sucursal, fecha, {hround_sql(_IT, 2)} AS it FROM mart),
last AS (SELECT sucursal, MAX(fecha) AS last_fecha FROM daily GROUP BY sucursal),
horizon AS (
  SELECT l.sucursal, u.h, l.last_fecha + CAST(u.h AS INT) AS target_fecha
  FROM last l, LATERAL (SELECT unnest(generate_series(1, {HORIZON})) AS h) u
),
cand AS (
  SELECT h.sucursal, h.h, h.target_fecha, d.fecha AS c_fecha, d.it,
         ROW_NUMBER() OVER (PARTITION BY h.sucursal, h.h
                            ORDER BY d.fecha DESC NULLS LAST) AS rn
  FROM horizon h
  LEFT JOIN daily d
    ON d.sucursal = h.sucursal
   AND dayofweek(d.fecha) = dayofweek(h.target_fecha)
   AND d.fecha < h.target_fecha
   AND d.fecha >= h.target_fecha - {7 * NAIVE_MAX_WEEKS}
)
SELECT sucursal, h, target_fecha, COALESCE(it, 0.0) AS valor
FROM cand WHERE rn = 1
"""


def forecast_deposit_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_deposit_schedule(payments_daily_mart(spark, sf_dir))


_CASH = CASH_DEPOSIT_SQL.format(d="fecha")
_CARD = CARD_DEPOSIT_SQL.format(d="fecha")

FORECAST_DEPOSIT_SCHEDULE_SQL = f"""
{_MART_CTE},
legs AS (
  SELECT CAST(({_CASH}) AS DATE) AS fecha_deposito,
         ingreso_efectivo AS efectivo, 0.0 AS tarjetas
  FROM mart
  UNION ALL
  SELECT CAST(({_CARD}) AS DATE) AS fecha_deposito,
         0.0 AS efectivo, (ingreso_credito + ingreso_debito) AS tarjetas
  FROM mart
),
agg AS (
  SELECT fecha_deposito,
         {hround_sql("SUM(efectivo)", 2)} AS efectivo,
         {hround_sql("SUM(tarjetas)", 2)} AS tarjetas
  FROM legs GROUP BY fecha_deposito
)
SELECT *, {hround_sql("efectivo + tarjetas", 2)} AS total FROM agg
"""


def deposit_cash_flow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cash-flow deposits over a historical + forecast blend
    (reference ``forecasting/cash_flow.py:19-85``).

    The forecast leg here is the strict t−7 naive (next 7 days per
    branch = same weekday last week, else 0) so the whole blend stays
    SQL-expressible; ``run_payments_forecast`` output plugs into
    :func:`cash_flow_deposits` identically.

    ``hist`` (day grain — tiny at any corpus scale) is persisted: it is
    referenced three times (last-date agg, forecast join side, blend
    union) with different column prunings, so the subtrees are not
    identical and exchange reuse cannot kick in — without the persist
    the whole mart (fact scans included) is computed three times.
    """
    from pos_pipeline_core_etl_spark.forecasting.deposit import cash_flow_deposits

    mart = payments_daily_mart(spark, sf_dir)
    hist = mart.select(
        "sucursal",
        "fecha",
        F.col("ingreso_efectivo").alias("efectivo"),
        F.col("ingreso_credito").alias("credito"),
        F.col("ingreso_debito").alias("debito"),
    ).persist()
    last = hist.groupBy("sucursal").agg(F.max("fecha").alias("last_fecha"))
    horizon = last.select(
        "sucursal",
        F.explode(F.sequence(F.lit(1), F.lit(HORIZON))).alias("h"),
        "last_fecha",
    ).select("sucursal", F.expr("date_add(last_fecha, h)").alias("fecha"))
    fc = horizon.join(
        hist.select(
            F.col("sucursal").alias("s2"),
            F.col("fecha").alias("f2"),
            "efectivo",
            "credito",
            "debito",
        ),
        (F.col("sucursal") == F.col("s2"))
        & (F.col("f2") == F.date_sub(F.col("fecha"), 7)),
        "left",
    ).select(
        "sucursal",
        "fecha",
        F.coalesce("efectivo", F.lit(0.0)).alias("efectivo"),
        F.coalesce("credito", F.lit(0.0)).alias("credito"),
        F.coalesce("debito", F.lit(0.0)).alias("debito"),
    )
    return cash_flow_deposits(hist.unionByName(fc))


DEPOSIT_CASH_FLOW_SQL = f"""
{_MART_CTE},
hist AS (
  SELECT sucursal, fecha, ingreso_efectivo AS efectivo,
         ingreso_credito AS credito, ingreso_debito AS debito
  FROM mart
),
last AS (SELECT sucursal, MAX(fecha) AS last_fecha FROM hist GROUP BY sucursal),
horizon AS (
  SELECT l.sucursal, l.last_fecha + CAST(u.h AS INT) AS fecha
  FROM last l, LATERAL (SELECT unnest(generate_series(1, {HORIZON})) AS h) u
),
fc AS (
  SELECT h.sucursal, h.fecha,
         COALESCE(d.efectivo, 0.0) AS efectivo,
         COALESCE(d.credito, 0.0) AS credito,
         COALESCE(d.debito, 0.0) AS debito
  FROM horizon h
  LEFT JOIN hist d ON d.sucursal = h.sucursal AND d.fecha = h.fecha - 7
),
blended AS (SELECT * FROM hist UNION ALL SELECT * FROM fc),
legs AS (
  SELECT CAST(({_CASH}) AS DATE) AS fecha_deposito,
         efectivo, 0.0 AS credito, 0.0 AS debito
  FROM blended
  UNION ALL
  SELECT CAST(({_CARD}) AS DATE) AS fecha_deposito,
         0.0 AS efectivo, credito, debito
  FROM blended
),
agg AS (
  SELECT fecha_deposito,
         {hround_sql("SUM(efectivo)", 2)} AS efectivo,
         {hround_sql("SUM(credito)", 2)} AS credito,
         {hround_sql("SUM(debito)", 2)} AS debito
  FROM legs GROUP BY fecha_deposito
)
SELECT *, {hround_sql("efectivo + credito + debito", 2)} AS total FROM agg
"""


def forecast_loglinear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas model fitting — rows-only check (not SQL-expressible)."""
    from pos_pipeline_core_etl_spark.forecasting.api import run_payments_forecast

    mart = payments_daily_mart(spark, sf_dir)
    return run_payments_forecast(mart).forecast


QUERIES: dict[str, tuple] = {
    "forecast_naive_lastweek": (forecast_naive_lastweek, FORECAST_NAIVE_LASTWEEK_SQL),
    "forecast_deposit_schedule": (
        forecast_deposit_schedule,
        FORECAST_DEPOSIT_SCHEDULE_SQL,
    ),
    "deposit_cash_flow": (deposit_cash_flow, DEPOSIT_CASH_FLOW_SQL),
    "forecast_loglinear": (forecast_loglinear, None),
}
