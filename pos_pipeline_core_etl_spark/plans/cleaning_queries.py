"""Scalar cleaning-function queries (SURVEY §2.9 coverage).

Each query synthesizes deterministic "dirty" inputs from the parquet
tables, cleans them with the engine's functions, and the oracle either
performs the identical transformation in DuckDB SQL or computes the
semantic ground truth directly (e.g. the number a locale-formatted
string must parse back to).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions import cleaning
from pos_pipeline_core_etl_spark.functions.buckets import (
    bucket_for_payment_method,
    bucket_for_payment_method_sql,
)
from pos_pipeline_core_etl_spark.plans import pos_adapter
from pos_pipeline_core_etl_spark.sources.tables import load_table


# ---------------------------------------------------------------------------
# strip_invisibles + neutralize


def fn_clean_strings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NBSP/tab noise + formula-injection prefixes, cleaned JVM-side."""
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    prefix = F.element_at(
        F.array(F.lit("="), F.lit("+"), F.lit("@"), F.lit("-"), F.lit("ok ")),
        (F.col("doc_id") % 5 + 1).cast("int"),
    )
    noisy = F.concat(
        F.lit(" "), prefix, F.substring("text", 1, 40), F.lit("\t ​")
    )
    return docs.select(
        "doc_id",
        cleaning.neutralize(cleaning.strip_invisibles(noisy)).alias("cleaned"),
    )


FN_CLEAN_STRINGS_SQL = r"""
WITH noisy AS (
  SELECT doc_id,
         chr(160) ||
         CASE doc_id % 5 WHEN 0 THEN '=' WHEN 1 THEN '+' WHEN 2 THEN '@'
                         WHEN 3 THEN '-' ELSE 'ok ' END ||
         substr(text, 1, 40) || chr(9) || ' ' || chr(8203) AS s
  FROM documents
),
stripped AS (
  SELECT doc_id,
         trim(regexp_replace(
           regexp_replace(s, '[\r\t\x{00A0}\x{202F}\x{200B}-\x{200D}\x{FEFF}]', ' ', 'g'),
           ' +', ' ', 'g')) AS s
  FROM noisy
)
SELECT doc_id,
       CASE WHEN substr(s, 1, 1) IN ('=', '+', '@', '-') THEN '''' || s ELSE s END AS cleaned
FROM stripped
"""


# ---------------------------------------------------------------------------
# to_float (locale-robust parse, pandas UDF hot path)


def fn_to_float_locale(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Format prices as US/EU/parenthesised-currency strings, parse back
    with the Arrow-vectorized ``to_float`` UDF. Prices are exactly 2-dp
    in the data, so parse(format(x)) must reproduce x bit-for-bit."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    us = F.format_number(F.col("l_extendedprice"), 2)  # 1,234,567.89
    eu = F.translate(us, ",.", ".,")  # 1.234.567,89
    neg = F.concat(F.lit("($"), us, F.lit(")"))  # ($1,234.56)
    return li.select(
        "l_orderkey",
        cleaning.to_float(us).alias("parsed_us"),
        cleaning.to_float(eu).alias("parsed_eu"),
        cleaning.to_float(neg).alias("parsed_neg"),
    )


FN_TO_FLOAT_LOCALE_SQL = """
SELECT l_orderkey,
       l_extendedprice AS parsed_us,
       l_extendedprice AS parsed_eu,
       -l_extendedprice AS parsed_neg
FROM lineitem WHERE l_linenumber = 1
"""


def fn_to_float_expr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same parse through the pure-JVM fast path (no Python)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    us = F.format_number(F.col("l_extendedprice"), 2)
    eu = F.translate(us, ",.", ".,")
    neg = F.concat(F.lit("($"), us, F.lit(")"))
    return li.select(
        "l_orderkey",
        cleaning.to_float_expr(us).alias("parsed_us"),
        cleaning.to_float_expr(eu).alias("parsed_eu"),
        cleaning.to_float_expr(neg).alias("parsed_neg"),
    )


def fn_to_int(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``to_int`` = half-even round of the locale parse (reference
    ``cleaning_utils.py:200-222``); exercised on US/EU/parenthesised
    renderings of prices (2-dp → rounds to nearest peso)."""
    li = load_table(spark, sf_dir, "lineitem").where(F.col("l_linenumber") == 1)
    us = F.format_number(F.col("l_extendedprice"), 2)
    eu = F.translate(us, ",.", ".,")
    neg = F.concat(F.lit("($"), us, F.lit(")"))
    return li.select(
        "l_orderkey",
        cleaning.to_int_expr(us).alias("int_us"),
        cleaning.to_int_expr(eu).alias("int_eu"),
        cleaning.to_int_expr(neg).alias("int_neg"),
    )


FN_TO_INT_SQL = """
SELECT l_orderkey,
       CAST(round_even(l_extendedprice, 0) AS BIGINT) AS int_us,
       CAST(round_even(l_extendedprice, 0) AS BIGINT) AS int_eu,
       CAST(round_even(-l_extendedprice, 0) AS BIGINT) AS int_neg
FROM lineitem WHERE l_linenumber = 1
"""


# ---------------------------------------------------------------------------
# to_date multi-format (parse-order semantics preserved)


def fn_to_date_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Render dates in 3 formats by key, parse via ordered coalesce.

    The dd/MM-before-MM/dd attempt order is semantic: an MM/dd string
    with day ≤ 12 deliberately mis-parses as the swapped date — the
    oracle reproduces that, proving the rebuild honors reference parse
    order (cleaning_utils.py:225-258) rather than "fixing" it.
    """
    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    rendered = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format(d, "dd/MM/yyyy"))
        .otherwise(F.date_format(d, "MM/dd/yyyy"))
    )
    return orders.select(
        "o_orderkey", cleaning.to_date_multi(rendered).alias("parsed_date")
    )


FN_TO_DATE_MULTI_SQL = """
SELECT o_orderkey,
  CASE
    WHEN o_orderkey % 3 = 2 AND EXTRACT(day FROM o_orderdate) <= 12
      THEN make_date(CAST(EXTRACT(year FROM o_orderdate) AS INT),
                     CAST(EXTRACT(day FROM o_orderdate) AS INT),
                     CAST(EXTRACT(month FROM o_orderdate) AS INT))
    ELSE CAST(o_orderdate AS DATE)
  END AS parsed_date
FROM orders
"""


# ---------------------------------------------------------------------------
# accent folding + payment bucketing


def fn_accent_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalize accented Spanish method names and bucket them —
    the when-chain precedence test (payments_daily.py:157-207)."""
    fact = pos_adapter.fact_payments_ticket(spark, sf_dir)
    methods = fact.select("payment_method").distinct()
    return methods.select(
        "payment_method",
        cleaning.normalize_spanish_name(F.col("payment_method")).alias("normalized"),
        bucket_for_payment_method(F.col("payment_method")).alias("bucket"),
    )


FN_ACCENT_BUCKET_SQL = f"""
WITH fact AS ({pos_adapter.FACT_PAYMENTS_SQL}),
methods AS (SELECT DISTINCT payment_method FROM fact)
SELECT payment_method,
       trim(regexp_replace(strip_accents(lower(payment_method)), '\\s+', ' ', 'g'))
         AS normalized,
       {bucket_for_payment_method_sql("strip_accents(lower(payment_method))")} AS bucket
FROM methods
"""


# ---------------------------------------------------------------------------
# tri-state boolean coercion


def fn_coerce_bool(spark: SparkSession, sf_dir: str) -> DataFrame:
    """'si/sí/yes/true/1' → true, 'no/false/0' → false, else null
    (sales_cleaner.py:405-421)."""
    orders = load_table(spark, sf_dir, "orders")
    raw = F.element_at(
        F.array(*[F.lit(v) for v in ("si", "Sí", "YES", "true", "No", "0", "maybe")]),
        (F.col("o_orderkey") % 7 + 1).cast("int"),
    )
    lowered = F.lower(cleaning.remove_accents_col(raw))
    coerced = (
        F.when(lowered.isin("si", "yes", "true", "1"), F.lit(True))
        .when(lowered.isin("no", "false", "0"), F.lit(False))
        .otherwise(F.lit(None).cast("boolean"))
    )
    return orders.select("o_orderkey", raw.alias("raw_value"), coerced.alias("coerced"))


FN_COERCE_BOOL_SQL = """
WITH t AS (
  SELECT o_orderkey,
         ['si', 'Sí', 'YES', 'true', 'No', '0', 'maybe'][CAST(o_orderkey % 7 AS INT) + 1]
           AS raw_value
  FROM orders
)
SELECT o_orderkey, raw_value,
  CASE
    WHEN strip_accents(lower(raw_value)) IN ('si', 'yes', 'true', '1') THEN TRUE
    WHEN strip_accents(lower(raw_value)) IN ('no', 'false', '0') THEN FALSE
    ELSE NULL
  END AS coerced
FROM t
"""


# ---------------------------------------------------------------------------
# safe division + derived tax totals (transfer_cleaner.py:212-222)


def fn_safe_unit_cost(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    qty = F.when(F.col("l_linenumber") == 7, F.lit(0.0)).otherwise(F.col("l_quantity"))
    from pos_pipeline_core_etl_spark.functions.rounding import hround

    return li.select(
        "l_orderkey",
        "l_linenumber",
        qty.alias("cantidad"),
        hround(F.col("l_extendedprice") * F.col("l_tax"), 2).alias("iva_total"),
        F.when((qty == 0) | qty.isNull(), F.lit(None).cast("double"))
        .otherwise(hround(F.col("l_extendedprice") / qty, 4))
        .alias("unit_cost"),
    )


def _safe_unit_cost_sql() -> str:
    from pos_pipeline_core_etl_spark.functions.rounding import hround_sql

    return f"""
WITH t AS (
  SELECT l_orderkey, l_linenumber,
         CASE WHEN l_linenumber = 7 THEN 0.0 ELSE l_quantity END AS cantidad,
         l_extendedprice, l_tax
  FROM lineitem
)
SELECT l_orderkey, l_linenumber, cantidad,
       {hround_sql("l_extendedprice * l_tax", 2)} AS iva_total,
       CASE WHEN cantidad = 0 OR cantidad IS NULL THEN NULL
            ELSE {hround_sql("l_extendedprice / cantidad", 4)} END AS unit_cost
FROM t
"""


FN_SAFE_UNIT_COST_SQL = _safe_unit_cost_sql()


# ---------------------------------------------------------------------------
# JSON property extraction (events.props)


def fn_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Typed extraction from a JSON string column — driver for the
    semi-structured path (events.props)."""
    events = load_table(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k"),
    )


FN_JSON_EXTRACT_SQL = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
FROM events
"""


# ---------------------------------------------------------------------------
# composed silver cleaner (bronze→silver end-to-end)


def silver_clean_payments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw string-typed payments rows (mixed date formats, formatted
    numbers, NBSP noise, eliminated-set sidecar) → typed silver fact via
    the one-plan cleaner (operators.cleaners.clean_payments)."""
    from pos_pipeline_core_etl_spark.operators.cleaners import clean_payments

    orders = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate").cast("date")
    date_str = (
        F.when(F.col("o_orderkey") % 3 == 0, F.date_format(d, "yyyy-MM-dd"))
        .when(F.col("o_orderkey") % 3 == 1, F.date_format(d, "dd/MM/yyyy"))
        .otherwise(F.date_format(d, "MM/dd/yyyy"))
    )
    method = F.element_at(
        F.array(*[F.lit(m) for m in pos_adapter.PAYMENT_METHODS]),
        (F.col("o_orderkey") % 9 + 1).cast("int"),
    )
    raw = orders.select(
        F.lit("Kavia").alias("sucursal"),
        date_str.alias("operating_date"),
        F.col("o_orderkey").cast("string").alias("order_index"),
        F.concat(F.lit(" "), method, F.lit("  ")).alias("payment_method"),
        F.format_number(F.col("o_totalprice"), 2).alias("ticket_total"),
        F.format_number(F.col("o_totalprice") * 0.1, 4).alias("ticket_tip"),
    )
    eliminated = (
        orders.where((F.col("o_orderstatus") == "F") & (F.col("o_orderkey") % 17 == 0))
        .select(
            date_str.alias("operating_date"),
            F.col("o_orderkey").cast("string").alias("order_index"),
        )
    )
    return clean_payments(raw, eliminated)


def _silver_clean_payments_oracle() -> str:
    from pos_pipeline_core_etl_spark.functions.rounding import hround_sql

    parsed_date = """
  CASE
    WHEN o_orderkey % 3 = 2 AND EXTRACT(day FROM o_orderdate) <= 12
      THEN make_date(CAST(EXTRACT(year FROM o_orderdate) AS INT),
                     CAST(EXTRACT(day FROM o_orderdate) AS INT),
                     CAST(EXTRACT(month FROM o_orderdate) AS INT))
    ELSE CAST(o_orderdate AS DATE)
  END"""
    method = pos_adapter._method_case_sql("o_orderkey")
    return f"""
SELECT 'Kavia' AS sucursal,
       {parsed_date} AS operating_date,
       o_orderkey AS order_index,
       {method} AS payment_method,
       o_totalprice AS ticket_total,
       {hround_sql("o_totalprice * 0.1", 4)} AS ticket_tip,
       (o_orderstatus = 'F' AND o_orderkey % 17 = 0) AS elimination_present
FROM orders
"""


SILVER_CLEAN_PAYMENTS_SQL = _silver_clean_payments_oracle()


QUERIES: dict[str, tuple] = {
    "fn_clean_strings": (fn_clean_strings, FN_CLEAN_STRINGS_SQL),
    "silver_clean_payments": (silver_clean_payments, SILVER_CLEAN_PAYMENTS_SQL),
    "fn_to_float_locale": (fn_to_float_locale, FN_TO_FLOAT_LOCALE_SQL),
    "fn_to_float_expr": (fn_to_float_expr, FN_TO_FLOAT_LOCALE_SQL),
    "fn_to_int": (fn_to_int, FN_TO_INT_SQL),
    "fn_to_date_multi": (fn_to_date_multi, FN_TO_DATE_MULTI_SQL),
    "fn_accent_bucket": (fn_accent_bucket, FN_ACCENT_BUCKET_SQL),
    "fn_coerce_bool": (fn_coerce_bool, FN_COERCE_BOOL_SQL),
    "fn_safe_unit_cost": (fn_safe_unit_cost, FN_SAFE_UNIT_COST_SQL),
    "fn_json_extract": (fn_json_extract, FN_JSON_EXTRACT_SQL),
}
