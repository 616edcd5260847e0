"""Public query API (reference parity: SURVEY §2.12 query fns).

Mirrors the reference's ``get_payments`` / ``get_sales`` /
``run_payments_qa`` / ``run_payments_forecast`` surface
(``etl/queries.py:30-296``, ``payments/api.py:19-147``,
``sales/api.py:19-96``): grain-addressed access to the facts and marts,
with metadata-aware stage materialization (``mode='missing'`` reuses
finished stages, ``'force'`` rebuilds) when a ``warehouse_dir`` is
given, or pure-lazy plans when not.
"""

from __future__ import annotations

import datetime as dt

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.plans import pos_adapter
from pos_pipeline_core_etl_spark.operators.payments import build_payments_daily
from pos_pipeline_core_etl_spark.operators.sales import (
    build_sales_by_group,
    build_sales_by_ticket,
)
from pos_pipeline_core_etl_spark.operators.transfers import build_transfers_cube
from pos_pipeline_core_etl_spark.sources.metadata import run_stage

PAYMENT_GRAINS = ("ticket", "daily")
SALES_GRAINS = ("item", "ticket", "group", "day")


def _range_filter(df: DataFrame, date_col: str, start: dt.date | None, end: dt.date | None) -> DataFrame:
    if start is not None:
        df = df.where(F.col(date_col) >= F.lit(start))
    if end is not None:
        df = df.where(F.col(date_col) <= F.lit(end))
    return df


def get_payments(
    spark: SparkSession,
    sf_dir: str,
    grain: str = "daily",
    start: dt.date | None = None,
    end: dt.date | None = None,
    branches: list[str] | None = None,
    warehouse_dir: str | None = None,
    mode: str = "missing",
) -> DataFrame:
    """Payments at ticket or daily grain, optionally range/branch-filtered.

    With ``warehouse_dir``, stages materialize as partitioned Parquet
    with skip-if-done metadata; without it the plan stays lazy
    end-to-end (Catalyst sees the full lineage).
    """
    if grain not in PAYMENT_GRAINS:
        raise ValueError(f"grain must be one of {PAYMENT_GRAINS}, got {grain!r}")

    def build_fact(s: SparkSession) -> DataFrame:
        return pos_adapter.fact_payments_ticket(s, sf_dir)

    if warehouse_dir:
        s0 = start or dt.date(1992, 1, 1)
        e0 = end or dt.date(1998, 12, 31)
        fact = run_stage(
            spark, warehouse_dir, "fact_payments_ticket", s0, e0, build_fact,
            partition_by=("operating_date",), mode=mode,
        )
    else:
        fact = build_fact(spark)

    if grain == "ticket":
        df = _range_filter(fact, "operating_date", start, end)
    else:
        mart = build_payments_daily(fact, pos_adapter.holidays(spark, sf_dir))
        df = _range_filter(mart, "fecha", start, end)
    if branches:
        df = df.where(F.col("sucursal").isin(branches))
    return df


def get_sales(
    spark: SparkSession,
    sf_dir: str,
    grain: str = "item",
    start: dt.date | None = None,
    end: dt.date | None = None,
) -> DataFrame:
    """Sales at item / ticket / group grain (``sales/api.py:19-96``)."""
    if grain not in SALES_GRAINS:
        raise ValueError(f"grain must be one of {SALES_GRAINS}, got {grain!r}")
    if grain == "day":
        # reference parity: aggregate_sales(level="day") is declared but
        # unimplemented there too (etl/sales.py:656-658, SURVEY §3.2)
        raise NotImplementedError(
            "sales grain 'day' is not implemented (reference parity: "
            "etl/sales.py:656-658)"
        )
    fact = pos_adapter.fact_sales_item_line(spark, sf_dir)
    fact = _range_filter(fact, "operating_date", start, end)
    if grain == "item":
        return fact
    if grain == "ticket":
        return build_sales_by_ticket(fact)
    return build_sales_by_group(fact)


def get_transfers(
    spark: SparkSession,
    sf_dir: str,
    start: dt.date | None = None,
    end: dt.date | None = None,
) -> DataFrame:
    fact = pos_adapter.fact_transfers_line(spark, sf_dir)
    return _range_filter(fact, "fecha", start, end)


def get_transfers_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    return build_transfers_cube(pos_adapter.fact_transfers_line(spark, sf_dir))
