"""Schema contracts for facts and marts (SURVEY §7.2.1).

The reference enforces required-column contracts at stage boundaries and
raises on violation (``payments_daily.py:341-344``,
``sales_by_ticket.py:195-202``, ``qa_payments.py:67-82``). Here each
contract is an explicit ``StructType``; ``enforce_contract`` checks the
column-name/type subset BEFORE an action runs, so violations fail at
plan time, not halfway through a 100 TB job.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import types as T

FACT_PAYMENTS_TICKET = T.StructType(
    [
        T.StructField("sucursal", T.StringType()),
        T.StructField("operating_date", T.DateType()),
        T.StructField("order_index", T.LongType()),
        T.StructField("payment_method", T.StringType()),
        T.StructField("ticket_total", T.DoubleType()),
        T.StructField("ticket_tip", T.DoubleType()),
        T.StructField("elimination_present", T.BooleanType()),
    ]
)

FACT_SALES_ITEM_LINE = T.StructType(
    [
        T.StructField("sucursal", T.StringType()),
        T.StructField("operating_date", T.DateType()),
        T.StructField("order_id", T.LongType()),
        T.StructField("item_key", T.StringType()),
        T.StructField("group", T.StringType()),
        T.StructField("quantity", T.DoubleType()),
        T.StructField("subtotal_item", T.DoubleType()),
        T.StructField("total_item", T.DoubleType()),
        T.StructField("captured_time", T.StringType()),
    ]
)

FACT_TRANSFERS_LINE = T.StructType(
    [
        T.StructField("orden", T.StringType()),
        T.StructField("almacen_origen", T.StringType()),
        T.StructField("sucursal_destino", T.StringType()),
        T.StructField("fecha", T.DateType()),
        T.StructField("cantidad", T.DoubleType()),
        T.StructField("departamento", T.StringType()),
        T.StructField("costo", T.DoubleType()),
        T.StructField("iva", T.DoubleType()),
        T.StructField("costo_unitario", T.DoubleType()),
    ]
)

MART_PAYMENTS_DAILY_REQUIRED = (
    "sucursal",
    "fecha",
    "ingreso_efectivo",
    "ingreso_credito",
    "ingreso_debito",
    "propinas",
    "num_tickets",
    "tickets_with_eliminations",
    "pct_tickets_with_eliminations",
    "is_national_holiday",
)


class ContractViolation(ValueError):
    pass


def enforce_contract(df: DataFrame, schema: T.StructType, exact: bool = False) -> DataFrame:
    """Raise ``ContractViolation`` unless ``df`` carries every contract
    field with the contract type. ``exact`` also rejects extras."""
    actual = {f.name: f.dataType for f in df.schema.fields}
    missing = [f.name for f in schema.fields if f.name not in actual]
    if missing:
        raise ContractViolation(f"missing required columns: {missing}")
    mismatched = [
        (f.name, str(actual[f.name]), str(f.dataType))
        for f in schema.fields
        if actual[f.name] != f.dataType
    ]
    if mismatched:
        raise ContractViolation(f"column type mismatches (col, actual, expected): {mismatched}")
    if exact:
        extras = [c for c in actual if c not in {f.name for f in schema.fields}]
        if extras:
            raise ContractViolation(f"unexpected extra columns: {extras}")
    return df


def require_columns(df: DataFrame, cols: tuple[str, ...]) -> DataFrame:
    missing = [c for c in cols if c not in df.columns]
    if missing:
        raise ContractViolation(f"missing required columns: {missing}")
    return df


# ---------------------------------------------------------------------------
# LLM-pipeline input contracts: the documents / embeddings tables every
# dedup / similarity / text operator consumes. Enforced at plan time so a
# mis-shaped corpus fails before a 100 TB scan starts.

DOCUMENTS_INPUT = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("text", T.StringType()),
    ]
)

EMBEDDINGS_INPUT = T.StructType(
    [
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ]
)
