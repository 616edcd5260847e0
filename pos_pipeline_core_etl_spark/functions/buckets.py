"""Categorical bucketing rules (reference parity: SURVEY §2.9).

``bucket_for_payment_method`` re-expresses the ordered contains-rules of
``/root/reference/src/pos_core/etl/marts/payments_daily.py:157-207``.
RULE ORDER IS SEMANTIC: "tarjeta débito" must match ``debito`` before the
generic ``credito``/card fallbacks; subsidio before transfer; etc. The
Spark form is a single ``when``-chain, which Catalyst folds into one
codegen'd CASE expression — no UDF, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.cleaning import normalize_spanish_name

# bucket output column names for the daily payments mart (fixed universe →
# the pivot schema is static, never data-dependent)
PAYMENT_BUCKETS = (
    "efectivo",
    "rappi",
    "ubereats",
    "SubsidioTEC",
    "transferencia",
    "amex",
    "debito",
    "credito",
    "otros",
)

# ordered (substring, bucket) contains-rules; first match wins
_RULES = (
    ("efectivo", "efectivo"),
    ("rappi", "rappi"),
    ("uber", "ubereats"),
    ("subsidio", "SubsidioTEC"),
    ("tec", "SubsidioTEC"),
    ("transfer", "transferencia"),
    ("amex", "amex"),
    ("american", "amex"),
    ("debito", "debito"),
    ("credito", "credito"),
    ("tarjeta", "credito"),
)


def bucket_for_payment_method(col: Column) -> Column:
    """Map a raw payment-method string to its revenue bucket.

    Accent/case-insensitive substring rules, applied in reference order;
    anything unmatched falls into ``otros``.
    """
    norm = normalize_spanish_name(col)
    expr: Column | None = None
    for needle, bucket in _RULES:
        cond = norm.contains(needle)
        expr = F.when(cond, F.lit(bucket)) if expr is None else expr.when(cond, F.lit(bucket))
    assert expr is not None
    return expr.otherwise(F.lit("otros"))


def bucket_for_payment_method_sql(column_sql: str) -> str:
    """The DuckDB-oracle-equivalent CASE expression for the same rules.

    Generated from the same ``_RULES`` table so Spark and oracle can never
    drift. ``column_sql`` must already be accent-folded + lowered by the
    caller (DuckDB's ``strip_accents`` + ``lower``).
    """
    whens = "\n".join(
        f"WHEN {column_sql} LIKE '%{needle}%' THEN '{bucket}'" for needle, bucket in _RULES
    )
    return f"CASE {whens} ELSE 'otros' END"
