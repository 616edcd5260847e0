"""Deposit-schedule banking calendar (reference parity: SURVEY §2.13).

Rules (``/root/reference/src/pos_core/forecasting/deposit_schedule.py:31-155``):
- CASH deposits happen Mon/Wed/Fri only:
  Mon ← Fri+Sat+Sun sales; Wed ← Mon+Tue; Fri ← Wed+Thu.
- CARD (credito/debito) deposits land the next business day
  (Mon covers Fri/Sat/Sun).

The reference walks dates in Python; here the mapping sale_date →
deposit_date is a pure column expression on day-of-week (codegen'd),
and the schedule is one groupBy(deposit_date) — fully distributed.

Day-of-week convention: ``F.dayofweek`` = 1 (Sunday) … 7 (Saturday).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround

_DOW = {"sun": 1, "mon": 2, "tue": 3, "wed": 4, "thu": 5, "fri": 6, "sat": 7}


def cash_deposit_date(sale_date: Column) -> Column:
    """Mon←(Fri,Sat,Sun); Wed←(Mon,Tue); Fri←(Wed,Thu)."""
    dow = F.dayofweek(sale_date)
    return (
        F.when(dow == _DOW["fri"], F.date_add(sale_date, 3))
        .when(dow == _DOW["sat"], F.date_add(sale_date, 2))
        .when(dow == _DOW["sun"], F.date_add(sale_date, 1))
        .when(dow == _DOW["mon"], F.date_add(sale_date, 2))
        .when(dow == _DOW["tue"], F.date_add(sale_date, 1))
        .when(dow == _DOW["wed"], F.date_add(sale_date, 2))
        .otherwise(F.date_add(sale_date, 1))  # thu → fri
    )


CASH_DEPOSIT_SQL = """
CASE CAST(dayofweek({d}) AS INT)
  WHEN 5 THEN {d} + INTERVAL 3 DAY   -- fri → mon
  WHEN 6 THEN {d} + INTERVAL 2 DAY   -- sat → mon
  WHEN 0 THEN {d} + INTERVAL 1 DAY   -- sun → mon
  WHEN 1 THEN {d} + INTERVAL 2 DAY   -- mon → wed
  WHEN 2 THEN {d} + INTERVAL 1 DAY   -- tue → wed
  WHEN 3 THEN {d} + INTERVAL 2 DAY   -- wed → fri
  ELSE {d} + INTERVAL 1 DAY          -- thu → fri
END
"""


def card_deposit_date(sale_date: Column) -> Column:
    """Next business day; Mon covers Fri/Sat/Sun."""
    dow = F.dayofweek(sale_date)
    return (
        F.when(dow == _DOW["fri"], F.date_add(sale_date, 3))
        .when(dow == _DOW["sat"], F.date_add(sale_date, 2))
        .otherwise(F.date_add(sale_date, 1))
    )


CARD_DEPOSIT_SQL = """
CASE CAST(dayofweek({d}) AS INT)
  WHEN 5 THEN {d} + INTERVAL 3 DAY
  WHEN 6 THEN {d} + INTERVAL 2 DAY
  ELSE {d} + INTERVAL 1 DAY
END
"""


def cash_flow_deposits(daily: DataFrame) -> DataFrame:
    """Per-deposit-date efectivo / credito / debito / total.

    Reference parity: ``forecasting/cash_flow.py:19-85``
    (``calculate_cash_flow_deposits``) — the input ``daily`` frame is the
    blend of historical days and forecast days (the caller unions them),
    with columns (fecha, efectivo, credito, debito). Cash follows the
    Mon/Wed/Fri calendar; each card metric lands next business day and
    stays a separate column. One union + one groupBy — fully distributed,
    no calendar loop.
    """
    cash = daily.select(
        cash_deposit_date(F.col("fecha")).alias("fecha_deposito"),
        "efectivo",
        F.lit(0.0).alias("credito"),
        F.lit(0.0).alias("debito"),
    )
    cards = daily.select(
        card_deposit_date(F.col("fecha")).alias("fecha_deposito"),
        F.lit(0.0).alias("efectivo"),
        "credito",
        "debito",
    )
    return (
        cash.unionByName(cards)
        .groupBy("fecha_deposito")
        .agg(
            hround(F.sum("efectivo"), 2).alias("efectivo"),
            hround(F.sum("credito"), 2).alias("credito"),
            hround(F.sum("debito"), 2).alias("debito"),
        )
        .withColumn(
            "total",
            hround(F.col("efectivo") + F.col("credito") + F.col("debito"), 2),
        )
    )


def build_deposit_schedule(mart: DataFrame) -> DataFrame:
    """mart_payments_daily → per-deposit-date efectivo/tarjetas/total."""
    cash = mart.select(
        cash_deposit_date(F.col("fecha")).alias("fecha_deposito"),
        F.col("ingreso_efectivo").alias("efectivo"),
        F.lit(0.0).alias("tarjetas"),
    )
    cards = mart.select(
        card_deposit_date(F.col("fecha")).alias("fecha_deposito"),
        F.lit(0.0).alias("efectivo"),
        (F.col("ingreso_credito") + F.col("ingreso_debito")).alias("tarjetas"),
    )
    return (
        cash.unionByName(cards)
        .groupBy("fecha_deposito")
        .agg(
            hround(F.sum("efectivo"), 2).alias("efectivo"),
            hround(F.sum("tarjetas"), 2).alias("tarjetas"),
        )
        .withColumn("total", hround(F.col("efectivo") + F.col("tarjetas"), 2))
    )
