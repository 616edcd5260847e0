"""QA-suite queries with DuckDB oracles (SURVEY §2.11 coverage).

Each check runs over the payments daily mart derived in-engine (the
oracle re-derives the identical mart as a CTE), so these validate the
full pipeline → QA composition end-to-end.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pos_pipeline_core_etl_spark.functions.rounding import hround_sql
from pos_pipeline_core_etl_spark.operators import qa
from pos_pipeline_core_etl_spark.plans.marts import PAYMENTS_DAILY_MART_SQL, payments_daily_mart

_MART_CTE = f"WITH mart AS ({PAYMENTS_DAILY_MART_SQL})"

# left-fold order matches qa.ingreso_total_col()
_IT = "(" + " + ".join(qa.INGRESO_COLS) + ")"


def qa_duplicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.check_duplicates(payments_daily_mart(spark, sf_dir))


QA_DUPLICATES_SQL = f"""
{_MART_CTE}
SELECT sucursal, fecha, COUNT(*) AS n
FROM mart GROUP BY 1, 2 HAVING COUNT(*) > 1
"""


def qa_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.check_nulls(payments_daily_mart(spark, sf_dir))


def _nulls_oracle() -> str:
    cols = ("sucursal", "fecha", *qa.INGRESO_COLS, "propinas", "num_tickets")
    cells = ",\n".join(
        f'  COUNT(CASE WHEN {c} IS NULL THEN 1 END) AS "nulls_{c}"' for c in cols
    )
    return f"{_MART_CTE}\nSELECT\n{cells}\nFROM mart"


QA_NULLS_SQL = _nulls_oracle()


def qa_non_negative(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.check_non_negative(payments_daily_mart(spark, sf_dir))


def _non_negative_oracle() -> str:
    cols = (*qa.INGRESO_COLS, "propinas")
    cells = ",\n".join(f'  MIN({c}) AS "min_{c}"' for c in cols)
    return f"{_MART_CTE}\nSELECT\n{cells}\nFROM mart"


QA_NON_NEGATIVE_SQL = _non_negative_oracle()


def qa_revenue_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.check_revenue_consistency(payments_daily_mart(spark, sf_dir))


QA_REVENUE_CONSISTENCY_SQL = f"""
{_MART_CTE}
SELECT
  COUNT(CASE WHEN num_tickets > 0 AND {_IT} <= 1e-6 THEN 1 END) AS tickets_no_revenue,
  COUNT(CASE WHEN {_IT} > 1e-6 AND num_tickets <= 0 THEN 1 END) AS revenue_no_tickets
FROM mart
"""


def qa_per_sucursal_ranges(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.per_sucursal_ranges(payments_daily_mart(spark, sf_dir))


QA_PER_SUCURSAL_RANGES_SQL = f"""
{_MART_CTE},
agg AS (
  SELECT sucursal, COUNT(*) AS rows, MIN(fecha) AS fecha_min, MAX(fecha) AS fecha_max,
         {hround_sql(f"SUM({_IT})", 2)} AS total_ingreso,
         CAST(SUM(num_tickets) AS BIGINT) AS total_tickets
  FROM mart GROUP BY sucursal
)
SELECT *,
  CASE WHEN total_tickets = 0 THEN NULL
       ELSE {hround_sql("total_ingreso / total_tickets", 2)} END AS avg_ticket
FROM agg
"""


def qa_missing_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.detect_missing_days(payments_daily_mart(spark, sf_dir))


QA_MISSING_DAYS_SQL = f"""
{_MART_CTE},
r AS (SELECT sucursal, MIN(fecha) AS d0, MAX(fecha) AS d1 FROM mart GROUP BY sucursal),
cal AS (
  SELECT r.sucursal, CAST(u.d AS DATE) AS fecha
  FROM r, LATERAL (SELECT unnest(generate_series(r.d0, r.d1, INTERVAL 1 DAY)) AS d) u
)
SELECT c.sucursal, c.fecha
FROM cal c
WHERE NOT EXISTS (
  SELECT 1 FROM mart m WHERE m.sucursal = c.sucursal AND m.fecha = c.fecha
)
"""


def qa_zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.detect_zscore_anomalies(payments_daily_mart(spark, sf_dir))


QA_ZSCORE_ANOMALIES_SQL = f"""
{_MART_CTE},
base AS (SELECT sucursal, fecha, {_IT} AS it FROM mart),
scored AS (
  SELECT sucursal, fecha, it,
         AVG(it) OVER w AS roll_mean,
         STDDEV_SAMP(it) OVER w AS roll_std
  FROM base
  WINDOW w AS (PARTITION BY sucursal ORDER BY fecha
               ROWS BETWEEN {qa.ZSCORE_WINDOW - 1} PRECEDING AND CURRENT ROW)
),
z AS (
  SELECT sucursal, fecha, {hround_sql("it", 2)} AS ingreso_total,
         CASE WHEN roll_std IS NULL OR roll_std = 0 THEN NULL
              ELSE {hround_sql("(it - roll_mean) / roll_std", 4)} END AS z
  FROM scored
)
SELECT * FROM z WHERE ABS(z) >= {qa.ZSCORE_THRESHOLD}
"""


def qa_zero_method_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.detect_zero_method_flags(payments_daily_mart(spark, sf_dir))


QA_ZERO_METHOD_FLAGS_SQL = f"""
{_MART_CTE}
SELECT sucursal, fecha, num_tickets, ingreso_efectivo
FROM mart
WHERE num_tickets > 0 AND ingreso_credito = 0 AND ingreso_debito = 0
"""


def qa_monthly_sales(spark: SparkSession, sf_dir: str) -> DataFrame:
    return qa.monthly_sales_table(payments_daily_mart(spark, sf_dir))


QA_MONTHLY_SALES_SQL = f"""
{_MART_CTE}
SELECT sucursal, strftime(fecha, '%Y-%m') AS year_month,
       {hround_sql(f"SUM({_IT})", 2)} AS ventas,
       {hround_sql("AVG(pct_tickets_with_eliminations)", 4)} AS avg_pct_elim
FROM mart GROUP BY 1, 2
"""


def qa_sample_months(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Seeded month sampling with per-bucket breakdown
    (qa_payments.py:824-966 analog). The reference seeds ``random``;
    here selection is hash-based so it is deterministic across engines
    AND across cluster sizes (a seeded ``rand()`` is neither)."""
    mart = payments_daily_mart(spark, sf_dir)
    from pyspark.sql import functions as F

    ym = F.date_format("fecha", "yyyy-MM")
    pick = (
        F.conv(F.substring(F.md5(F.concat_ws("_", F.col("sucursal"), ym)), 1, 4), 16, 10)
        .cast("long") % 10 == 0
    )
    from pos_pipeline_core_etl_spark.functions.rounding import hround

    return (
        mart.where(pick)
        .groupBy("sucursal", ym.alias("year_month"))
        .agg(
            hround(F.sum("ingreso_efectivo"), 2).alias("efectivo"),
            hround(F.sum("ingreso_credito"), 2).alias("credito"),
            hround(F.sum("ingreso_debito"), 2).alias("debito"),
            F.sum("num_tickets").alias("tickets"),
        )
    )


QA_SAMPLE_MONTHS_SQL = f"""
{_MART_CTE},
flagged AS (
  SELECT *, strftime(fecha, '%Y-%m') AS year_month
  FROM mart
  WHERE CAST(('0x' || substr(md5(sucursal || '_' || strftime(fecha, '%Y-%m')), 1, 4)) AS BIGINT) % 10 = 0
)
SELECT sucursal, year_month,
       {hround_sql("SUM(ingreso_efectivo)", 2)} AS efectivo,
       {hround_sql("SUM(ingreso_credito)", 2)} AS credito,
       {hround_sql("SUM(ingreso_debito)", 2)} AS debito,
       CAST(SUM(num_tickets) AS BIGINT) AS tickets
FROM flagged
GROUP BY 1, 2
"""


QUERIES: dict[str, tuple] = {
    "qa_sample_months": (qa_sample_months, QA_SAMPLE_MONTHS_SQL),
    "qa_duplicates": (qa_duplicates, QA_DUPLICATES_SQL),
    "qa_nulls": (qa_nulls, QA_NULLS_SQL),
    "qa_non_negative": (qa_non_negative, QA_NON_NEGATIVE_SQL),
    "qa_revenue_consistency": (qa_revenue_consistency, QA_REVENUE_CONSISTENCY_SQL),
    "qa_per_sucursal_ranges": (qa_per_sucursal_ranges, QA_PER_SUCURSAL_RANGES_SQL),
    "qa_missing_days": (qa_missing_days, QA_MISSING_DAYS_SQL),
    "qa_zscore_anomalies": (qa_zscore_anomalies, QA_ZSCORE_ANOMALIES_SQL),
    "qa_zero_method_flags": (qa_zero_method_flags, QA_ZERO_METHOD_FLAGS_SQL),
    "qa_monthly_sales": (qa_monthly_sales, QA_MONTHLY_SALES_SQL),
}
