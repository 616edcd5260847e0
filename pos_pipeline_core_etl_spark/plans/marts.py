"""Gold-layer mart queries (reference parity: SURVEY §2.5, §3.1-3.2).

Runs the domain mart pipelines over POS-shaped facts derived from the
synthetic star schema (see ``plans.pos_adapter``); each has a full DuckDB
oracle performing the identical derivation + mart in SQL.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pos_pipeline_core_etl_spark.functions.buckets import (
    PAYMENT_BUCKETS,
    bucket_for_payment_method_sql,
)
from pos_pipeline_core_etl_spark.functions.rounding import hround_sql
from pos_pipeline_core_etl_spark.operators.payments import build_payments_daily
from pos_pipeline_core_etl_spark.plans import pos_adapter


def payments_daily_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: fact_payments_ticket → mart_payments_daily.

    Single-shuffle conditional-aggregate plan (see operators.payments).
    """
    fact = pos_adapter.fact_payments_ticket(spark, sf_dir)
    hol = pos_adapter.holidays(spark, sf_dir)
    return build_payments_daily(fact, hol)


def _payments_daily_oracle() -> str:
    bucket_case = bucket_for_payment_method_sql(
        "strip_accents(lower(payment_method))"
    )
    ingreso_cols = ",\n".join(
        "    "
        + hround_sql(f"COALESCE(SUM(CASE WHEN bucket = '{b}' THEN ticket_total END), 0)", 2)
        + f" AS ingreso_{b}"
        for b in PAYMENT_BUCKETS
    )
    return f"""
WITH fact AS ({pos_adapter.FACT_PAYMENTS_SQL}),
bucketed AS (
  SELECT f.*, {bucket_case} AS bucket FROM fact f
),
hol AS ({pos_adapter.HOLIDAYS_SQL}),
daily AS (
  SELECT sucursal, operating_date AS fecha,
{ingreso_cols},
    {hround_sql("SUM(ticket_tip)", 2)} AS propinas,
    COUNT(DISTINCT order_index) AS num_tickets,
    COUNT(DISTINCT CASE WHEN elimination_present THEN order_index END)
      AS tickets_with_eliminations
  FROM bucketed
  GROUP BY sucursal, operating_date
)
SELECT d.*,
       {hround_sql("100.0 * d.tickets_with_eliminations / d.num_tickets", 2)}
         AS pct_tickets_with_eliminations,
       (h.fecha IS NOT NULL) AS is_national_holiday
FROM daily d
LEFT JOIN hol h ON d.fecha = h.fecha
"""


PAYMENTS_DAILY_MART_SQL = _payments_daily_oracle()


QUERIES: dict[str, tuple] = {
    "payments_daily_mart": (payments_daily_mart, PAYMENTS_DAILY_MART_SQL),
}
