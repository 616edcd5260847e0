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

from pyspark.sql import DataFrame, SparkSession
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

NAIVE_MAX_WEEKS = 52  # reference naive.py:22 (max_weeks_back)
HORIZON = 7


def forecast_naive_lastweek(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per branch: next 7 days = value at the *equivalent historical
    weekday* (reference naive.py:19-180): the first same-weekday candidate
    ≤ last observed date that is not a holiday or holiday-adjacent,
    walking back ≤ 52 weeks. The candidate is chosen WITHOUT looking at
    the data; a missing date yields 0.

    Scale shape: candidates/horizon/holidays are dimension-sized (branches
    × 7 × 52 rows) and broadcast; ``daily`` — the only data-sized leg —
    is touched once by an equi-join.
    """
    mart = payments_daily_mart(spark, sf_dir)
    daily = mart.select(
        "sucursal", "fecha", hround(qa.ingreso_total_col(), 2).alias("it")
    )
    # holiday set → blocked dates (holiday ± 1), reference deposit_schedule.py:15-28
    blocked = (
        mart.where(F.col("is_national_holiday"))
        .select(F.col("fecha").alias("h_fecha"))
        .distinct()
        .select(
            F.explode(F.array(F.lit(-1), F.lit(0), F.lit(1))).alias("off"), "h_fecha"
        )
        .select(F.expr("date_add(h_fecha, off)").alias("b_fecha"))
        .distinct()
    )
    last = daily.groupBy("sucursal").agg(F.max("fecha").alias("last_fecha"))
    horizon = last.select(
        "sucursal",
        F.explode(F.sequence(F.lit(1), F.lit(HORIZON))).alias("h"),
        "last_fecha",
    ).select(
        "sucursal", "h", "last_fecha", F.expr("date_add(last_fecha, h)").alias("target_fecha")
    )
    cand = horizon.select(
        "sucursal",
        "h",
        "target_fecha",
        "last_fecha",
        F.explode(F.sequence(F.lit(1), F.lit(NAIVE_MAX_WEEKS))).alias("w"),
    ).withColumn("cand_fecha", F.expr("date_sub(target_fecha, 7 * w)"))
    eligible = cand.where(F.col("cand_fecha") <= F.col("last_fecha")).join(
        F.broadcast(blocked), cand.cand_fecha == blocked.b_fecha, "left_anti"
    )
    # min w ⇔ max candidate date (candidates step back 7 days per week)
    eq = eligible.groupBy("sucursal", "h", "target_fecha").agg(
        F.max("cand_fecha").alias("src_fecha")
    )
    return (
        horizon.join(eq, ["sucursal", "h", "target_fecha"], "left")
        .join(
            daily.select(
                F.col("sucursal").alias("d_suc"),
                F.col("fecha").alias("d_fecha"),
                "it",
            ),
            (F.col("sucursal") == F.col("d_suc"))
            & (F.col("src_fecha") == F.col("d_fecha")),
            "left",
        )
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
blocked AS (
  SELECT DISTINCT fecha + CAST(u.off AS INT) AS b_fecha
  FROM (SELECT DISTINCT fecha FROM mart WHERE is_national_holiday) hol,
       LATERAL (SELECT unnest([-1, 0, 1]) AS off) u
),
last AS (SELECT sucursal, MAX(fecha) AS last_fecha FROM daily GROUP BY sucursal),
horizon AS (
  SELECT l.sucursal, u.h, l.last_fecha,
         l.last_fecha + CAST(u.h AS INT) AS target_fecha
  FROM last l, LATERAL (SELECT unnest(generate_series(1, {HORIZON})) AS h) u
),
eligible AS (
  SELECT hz.sucursal, hz.h, hz.target_fecha,
         hz.target_fecha - CAST(7 * u.w AS INT) AS cand_fecha
  FROM horizon hz, LATERAL (SELECT unnest(generate_series(1, {NAIVE_MAX_WEEKS})) AS w) u
  WHERE hz.target_fecha - CAST(7 * u.w AS INT) <= hz.last_fecha
    AND NOT EXISTS (SELECT 1 FROM blocked b
                    WHERE b.b_fecha = hz.target_fecha - CAST(7 * u.w AS INT))
),
eq AS (
  SELECT sucursal, h, target_fecha, MAX(cand_fecha) AS src_fecha
  FROM eligible GROUP BY sucursal, h, target_fecha
)
SELECT hz.sucursal, hz.h, hz.target_fecha, COALESCE(d.it, 0.0) AS valor
FROM horizon hz
LEFT JOIN eq ON eq.sucursal = hz.sucursal AND eq.h = hz.h
            AND eq.target_fecha = hz.target_fecha
LEFT JOIN daily d ON d.sucursal = hz.sucursal AND d.fecha = eq.src_fecha
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
