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
from pos_pipeline_core_etl_spark.operators.payments import (
    build_payments_daily,
    build_payments_daily_incremental,
)
from pos_pipeline_core_etl_spark.plans import pos_adapter


def payments_daily_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: fact_payments_ticket → mart_payments_daily.

    Single-shuffle conditional-aggregate plan (see operators.payments).
    """
    fact = pos_adapter.fact_payments_ticket(spark, sf_dir)
    hol = pos_adapter.holidays_from_fact(fact)
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


def payments_daily_mart_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental refresh twin of the flagship mart: a deterministic
    late-arriving slice (order_index % 13 == 0 — rows scattered across
    existing (sucursal, fecha) groups) is re-aggregated against the
    already-built mart, touching only the affected groups
    (operators/payments.py::build_payments_daily_incremental). The
    oracle is the FULL mart SQL — the driver hash-check proves
    incremental ≡ full recompute every round."""
    from pyspark.sql import functions as F

    fact = pos_adapter.fact_payments_ticket(spark, sf_dir)
    hol = pos_adapter.holidays_from_fact(fact)
    return build_payments_daily_incremental(
        fact, hol, F.col("order_index") % 13 == 0
    )


# ---------------------------------------------------------------------------
# sales marts


def sales_by_ticket_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_sales_item_line → mart_sales_by_ticket (dual per-group pivot)."""
    from pos_pipeline_core_etl_spark.operators.sales import build_sales_by_ticket

    return build_sales_by_ticket(pos_adapter.fact_sales_item_line(spark, sf_dir))


def _sales_by_ticket_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.sales import SALES_GROUPS, sanitize_group_name

    cells = []
    for suffix, src in (("subtotal", "subtotal_item"), ("total", "total_item")):
        for g in SALES_GROUPS:
            name = f"{sanitize_group_name(g)}_{suffix}"
            expr = hround_sql(
                f"COALESCE(SUM(CASE WHEN \"group\" = '{g}' THEN {src} END), 0)", 2
            )
            cells.append(f'  {expr} AS "{name}"')
    cell_sql = ",\n".join(cells)
    return f"""
WITH fact AS ({pos_adapter.FACT_SALES_SQL})
SELECT sucursal, operating_date, order_id,
{cell_sql},
  MIN(captured_time) AS captured_time,
  MAX(captured_time) AS closing_time,
  COUNT(*) AS n_lines,
  {hround_sql("SUM(total_item)", 2)} AS total_ticket_cost
FROM fact
GROUP BY sucursal, operating_date, order_id
"""


SALES_BY_TICKET_MART_SQL = _sales_by_ticket_oracle()


def sales_by_group_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_sales_item_line → mart_sales_by_group (category × branch)."""
    from pos_pipeline_core_etl_spark.operators.sales import build_sales_by_group

    return build_sales_by_group(pos_adapter.fact_sales_item_line(spark, sf_dir))


def _sales_by_group_oracle() -> str:
    from pos_pipeline_core_etl_spark.operators.sales import (
        ROW_ORDER,
        category_for_group_sql,
    )

    cat = category_for_group_sql('"group"')
    orden_whens = "\n".join(
        f"WHEN {cat} = '{name}' THEN {i}" for i, name in enumerate(ROW_ORDER)
    )
    suc_cells = ",\n".join(
        "  "
        + hround_sql(
            f"COALESCE(SUM(CASE WHEN sucursal = '{s}' THEN subtotal_item END), 0)", 2
        )
        + f' AS "suc_{s}"'
        for s in ("A", "N", "R")
    )
    return f"""
WITH fact AS ({pos_adapter.FACT_SALES_SQL})
SELECT {cat} AS grupo_nuevo,
       CASE {orden_whens} ELSE 99 END AS orden,
{suc_cells}
FROM fact
GROUP BY 1, 2
"""


SALES_BY_GROUP_MART_SQL = _sales_by_group_oracle()


# ---------------------------------------------------------------------------
# transfers mart


def transfers_cube_mart(spark: SparkSession, sf_dir: str) -> DataFrame:
    """fact_transfers_line → category × branch money cube with TOTALs."""
    from pos_pipeline_core_etl_spark.operators.transfers import build_transfers_cube

    return build_transfers_cube(pos_adapter.fact_transfers_line(spark, sf_dir))


TRANSFERS_CUBE_MART_SQL = f"""
WITH fact AS ({pos_adapter.FACT_TRANSFERS_SQL})
SELECT COALESCE(departamento, 'TOTAL') AS categoria,
       COALESCE(sucursal_destino, 'TOTAL') AS sucursal_destino,
       {hround_sql("SUM(costo)", 2)} AS monto,
       COUNT(*) AS n_lines
FROM fact
GROUP BY CUBE (departamento, sucursal_destino)
"""


# ---------------------------------------------------------------------------
# silver facts exposed as queries (exercise the adapter joins/cleaning)


def fact_payments_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pos_adapter.fact_payments_ticket(spark, sf_dir)


def fact_sales_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pos_adapter.fact_sales_item_line(spark, sf_dir)


def fact_transfers_query(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pos_adapter.fact_transfers_line(spark, sf_dir)


QUERIES: dict[str, tuple] = {
    "payments_daily_mart": (payments_daily_mart, PAYMENTS_DAILY_MART_SQL),
    "payments_daily_mart_incremental": (
        payments_daily_mart_incremental,
        PAYMENTS_DAILY_MART_SQL,  # contract: incremental ≡ full recompute
    ),
    "sales_by_ticket_mart": (sales_by_ticket_mart, SALES_BY_TICKET_MART_SQL),
    "sales_by_group_mart": (sales_by_group_mart, SALES_BY_GROUP_MART_SQL),
    "transfers_cube_mart": (transfers_cube_mart, TRANSFERS_CUBE_MART_SQL),
    "fact_payments_ticket": (fact_payments_query, pos_adapter.FACT_PAYMENTS_SQL),
    "fact_sales_item_line": (fact_sales_query, pos_adapter.FACT_SALES_SQL),
    "fact_transfers_line": (fact_transfers_query, pos_adapter.FACT_TRANSFERS_SQL),
}
