"""Deterministic POS-shaped views over the synthetic star schema.

The reference engine operates on POS facts (``fact_payments_ticket``,
``fact_sales_item_line``, ``fact_transfers_line`` — see SURVEY §1.1 and
FIXTURES.md). The driver's correctness gate runs on TPC-H-ish parquet
tables, so this module derives POS-shaped facts from them with pure
deterministic expressions. Every derivation here has an exact SQL twin
(the ``*_SQL`` constants) used inside the DuckDB oracle queries, so the
Spark pipeline and the oracle consume byte-identical inputs.

Mapping (fact_payments_ticket, grain ticket × payment-method — the
reference's key ``(sucursal, operating_date, order_index,
payment_method)``, ``etl/staging/__init__.py:321-325``):

- sucursal        := customer's nation name (25 stable "branches")
- operating_date  := date(o_orderdate)
- order_index     := o_orderkey
- payment_method  := 9-way deterministic split on o_orderkey
- ticket_total    := o_totalprice
- ticket_tip      := round(o_totalprice * 0.1, 2)
- elimination_present := ticket appears in the derived eliminated set
  (status 'F' and o_orderkey divisible by 17) — mirrors the reference's
  eliminated-payments left join (``payments_cleaner.py:598-651``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround, hround_sql
from pos_pipeline_core_etl_spark.sources.tables import load_table

PAYMENT_METHODS = (
    "Efectivo",
    "Tarjeta Crédito",
    "Tarjeta Débito",
    "AMEX",
    "Uber Eats",
    "Rappi",
    "Transferencia",
    "Subsidio TEC",
    "Vales Despensa",
)


def _method_case_sql(key: str) -> str:
    whens = "\n".join(
        f"WHEN {key} % 9 = {i} THEN '{m}'" for i, m in enumerate(PAYMENT_METHODS)
    )
    return f"CASE {whens} END"


def fact_payments_ticket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POS payments fact derived from orders × customer × nation.

    customer and nation are broadcast-joined (nation is bounded at 25
    rows at any SF; customer is broadcast below the AQE threshold and
    falls back to a shuffled hash join beyond it — no code change).
    """
    orders = load_table(spark, sf_dir, "orders")
    customer = load_table(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")

    method = F.element_at(
        F.array(*[F.lit(m) for m in PAYMENT_METHODS]),
        (F.col("o_orderkey") % 9 + 1).cast("int"),
    )
    return (
        orders.join(customer, orders.o_custkey == customer.c_custkey)
        .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
        .select(
            F.col("n_name").alias("sucursal"),
            F.col("o_orderdate").cast("date").alias("operating_date"),
            F.col("o_orderkey").alias("order_index"),
            method.alias("payment_method"),
            F.col("o_totalprice").alias("ticket_total"),
            hround(F.col("o_totalprice") * 0.1, 2).alias("ticket_tip"),
            (
                (F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 17 == 0)
            ).alias("elimination_present"),
        )
    )


FACT_PAYMENTS_SQL = f"""
SELECT
  n.n_name AS sucursal,
  CAST(o.o_orderdate AS DATE) AS operating_date,
  o.o_orderkey AS order_index,
  {_method_case_sql("o.o_orderkey")} AS payment_method,
  o.o_totalprice AS ticket_total,
  {hround_sql("o.o_totalprice * 0.1", 2)} AS ticket_tip,
  (o.o_orderstatus = 'F' AND o.o_orderkey % 17 = 0) AS elimination_present
FROM orders o
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN nation n ON c.c_nationkey = n.n_nationkey
"""


def holidays(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Injected holiday dimension: first-of-month dates in the order range.

    Replaces the reference's live Nager.Date fetch
    (``payments_daily.py:218-306``) with a deterministic derived table.
    """
    orders = load_table(spark, sf_dir, "orders")
    return (
        orders.select(F.col("o_orderdate").cast("date").alias("fecha"))
        .where(F.dayofmonth("fecha") == 1)
        .distinct()
    )


HOLIDAYS_SQL = """
SELECT DISTINCT CAST(o_orderdate AS DATE) AS fecha
FROM orders
WHERE EXTRACT(day FROM o_orderdate) = 1
"""


def holidays_from_fact(fact: DataFrame) -> DataFrame:
    """Same holiday set derived from the payments fact itself — avoids a
    second scan of orders when the fact is already being built (every
    order row survives the customer/nation inner joins, so the date sets
    are identical to :func:`holidays`)."""
    return (
        fact.select(F.col("operating_date").alias("fecha"))
        .where(F.dayofmonth("fecha") == 1)
        .distinct()
    )


def fact_sales_item_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POS sales item-line fact from lineitem × part (grain: item line).

    Reference key ``(sucursal, operating_date, order_id, item_key)``
    (``etl/staging/__init__.py:327-331``); ``group`` plays the role of the
    sales category feeding the by-ticket / by-group marts.
    """
    from pos_pipeline_core_etl_spark.operators.common import ensure_parallelism

    # r13 (guide §2.5/§6): the sf bench ships lineitem as ONE parquet
    # file, so the scan — and everything fused into its stage: the
    # broadcast join, the per-row projection, and the ticket mart's
    # 50-cell conditional partial aggregate — ran as ONE task on 32
    # cores (isolated profile: sales_by_ticket_mart 39.8 executor-s
    # over 27 tasks, map side single-threaded).  Spreading the scan on
    # l_orderkey is exchange-reusable downstream: the ticket mart
    # groups by (sucursal, operating_date, order_id = l_orderkey), and
    # hash partitioning on a subset of the grouping key satisfies its
    # clustered distribution, so the mart's own exchange disappears
    # (plan: 2 Exchange → 1).  No-op at real scale (many input files).
    lineitem = ensure_parallelism(
        load_table(spark, sf_dir, "lineitem"), "l_orderkey"
    )
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_brand")
    return (
        lineitem.join(part, lineitem.l_partkey == part.p_partkey)
        .select(
            F.col("l_returnflag").alias("sucursal"),
            F.col("l_shipdate").cast("date").alias("operating_date"),
            F.col("l_orderkey").alias("order_id"),
            F.concat(F.lit("P"), F.col("l_partkey"), F.lit("#"), F.col("l_linenumber")).alias(
                "item_key"
            ),
            F.col("p_brand").alias("group"),
            F.col("l_quantity").alias("quantity"),
            hround(F.col("l_extendedprice") * (1 - F.col("l_discount")), 2).alias(
                "subtotal_item"
            ),
            hround(
                F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax")), 2
            ).alias("total_item"),
            F.date_format(F.col("l_shipdate"), "HH:mm:ss").alias("captured_time"),
        )
    )


FACT_SALES_SQL = f"""
SELECT
  l.l_returnflag AS sucursal,
  CAST(l.l_shipdate AS DATE) AS operating_date,
  l.l_orderkey AS order_id,
  'P' || CAST(l.l_partkey AS VARCHAR) || '#' || CAST(l.l_linenumber AS VARCHAR) AS item_key,
  p.p_brand AS "group",
  l.l_quantity AS quantity,
  {hround_sql("l.l_extendedprice * (1 - l.l_discount)", 2)} AS subtotal_item,
  {hround_sql("l.l_extendedprice * (1 - l.l_discount) * (1 + l.l_tax)", 2)} AS total_item,
  strftime(l.l_shipdate, '%H:%M:%S') AS captured_time
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
"""


def fact_transfers_line(spark: SparkSession, sf_dir: str) -> DataFrame:
    """POS transfers fact from lineitem × supplier × nation.

    Mirrors ``fact_transfers_line`` (SURVEY §1.1.2/FIXTURES §3): origin
    warehouse, destination branch, department, extended cost, unit cost
    with a zero-quantity guard (``transfer_cleaner.py:215-222``).
    """
    lineitem = load_table(spark, sf_dir, "lineitem")
    supplier = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_nationkey")
    nation = load_table(spark, sf_dir, "nation").select("n_nationkey", "n_name")
    part = load_table(spark, sf_dir, "part").select("p_partkey", "p_type")
    return (
        lineitem.join(F.broadcast(supplier), lineitem.l_suppkey == supplier.s_suppkey)
        .join(F.broadcast(nation), supplier.s_nationkey == nation.n_nationkey)
        .join(part, lineitem.l_partkey == part.p_partkey)
        .select(
            F.concat(F.lit("T"), F.col("l_orderkey"), F.lit("-"), F.col("l_linenumber")).alias(
                "orden"
            ),
            F.when(F.col("l_linestatus") == "F", F.lit("ALMACEN PRODUCTO TERMINADO"))
            .otherwise(F.lit("ALMACEN GENERAL"))
            .alias("almacen_origen"),
            F.col("n_name").alias("sucursal_destino"),
            F.col("l_shipdate").cast("date").alias("fecha"),
            F.col("l_quantity").alias("cantidad"),
            F.split(F.col("p_type"), " ").getItem(0).alias("departamento"),
            F.col("l_extendedprice").alias("costo"),
            hround(F.col("l_extendedprice") * F.col("l_tax"), 2).alias("iva"),
            F.when(F.col("l_quantity") == 0, F.lit(None).cast("double"))
            .otherwise(hround(F.col("l_extendedprice") / F.col("l_quantity"), 4))
            .alias("costo_unitario"),
        )
    )


FACT_TRANSFERS_SQL = f"""
SELECT
  'T' || CAST(l.l_orderkey AS VARCHAR) || '-' || CAST(l.l_linenumber AS VARCHAR) AS orden,
  CASE WHEN l.l_linestatus = 'F' THEN 'ALMACEN PRODUCTO TERMINADO'
       ELSE 'ALMACEN GENERAL' END AS almacen_origen,
  n.n_name AS sucursal_destino,
  CAST(l.l_shipdate AS DATE) AS fecha,
  l.l_quantity AS cantidad,
  str_split(p.p_type, ' ')[1] AS departamento,
  l.l_extendedprice AS costo,
  {hround_sql("l.l_extendedprice * l.l_tax", 2)} AS iva,
  CASE WHEN l.l_quantity = 0 THEN NULL
       ELSE {hround_sql("l.l_extendedprice / l.l_quantity", 4)} END AS costo_unitario
FROM lineitem l
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n ON s.s_nationkey = n.n_nationkey
JOIN part p ON l.l_partkey = p.p_partkey
"""
