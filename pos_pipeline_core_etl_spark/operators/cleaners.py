"""Silver-layer cleaners (SURVEY §3.1b — the bronze→silver transform).

Re-expresses ``transform_detalle_por_forma_pago``
(``/root/reference/src/pos_core/etl/staging/payments_cleaner.py:274-686``)
as one declarative pipeline over a raw-shaped DataFrame (headers already
named by the driver-side parse, ``sources.excel``):

text hygiene (strip invisibles + formula-neutralize) → date coercion
(multi-format) → locale-robust numeric coercion → footer/blank-row
filters → eliminated-payments dedup + left-join flag → column order.

Every step is a column expression or broadcast join — the whole cleaner
is a single Catalyst plan (the reference materializes ~10 intermediate
frames per file).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.cleaning import (
    neutralize,
    strip_invisibles,
    to_date_multi,
    to_float_expr,
)

PAYMENTS_TEXT_COLS = ("payment_method",)
PAYMENTS_NUMERIC_COLS = ("ticket_total", "ticket_tip")
PAYMENTS_OUT_ORDER = (
    "sucursal",
    "operating_date",
    "order_index",
    "payment_method",
    "ticket_total",
    "ticket_tip",
    "elimination_present",
)


def clean_payments(
    raw: DataFrame,
    eliminated: DataFrame | None = None,
    sucursal_hint: str | None = None,
) -> DataFrame:
    """Raw payments rows (string-typed) → typed silver fact.

    ``raw`` columns: sucursal?, operating_date, order_index,
    payment_method, ticket_total, ticket_tip — all strings.
    ``eliminated``: (operating_date, order_index) of eliminated tickets
    (deduplicated here, as payments_cleaner.py:438 does).
    """
    df = raw
    if sucursal_hint is not None and "sucursal" not in df.columns:
        df = df.withColumn("sucursal", F.lit(sucursal_hint))

    # footer/blank-row filter: first column blank → drop (cleaner :476-481)
    first_col = df.columns[0]
    df = df.where(
        F.col(first_col).isNotNull() & (F.trim(F.col(first_col).cast("string")) != "")
    )

    for c in PAYMENTS_TEXT_COLS:
        df = df.withColumn(c, neutralize(strip_invisibles(F.col(c))))
    df = df.withColumn("operating_date", to_date_multi(F.col("operating_date")))
    for c in PAYMENTS_NUMERIC_COLS:
        df = df.withColumn(c, to_float_expr(F.col(c)))
    df = df.withColumn(
        "order_index", F.col("order_index").cast("double").cast("long")
    )  # _to_int_or_none (payments_cleaner.py:111-124)

    if eliminated is not None:
        elim = (
            eliminated.select(
                to_date_multi(F.col("operating_date").cast("string")).alias("e_date"),
                F.col("order_index").cast("double").cast("long").alias("e_order"),
            )
            .dropDuplicates(["e_date", "e_order"])
        )
        df = df.join(
            F.broadcast(elim),
            (df.operating_date == F.col("e_date"))
            & (df.order_index == F.col("e_order")),
            "left",
        ).withColumn("elimination_present", F.col("e_order").isNotNull())
    else:
        df = df.withColumn("elimination_present", F.lit(False))

    return df.select(*[c for c in PAYMENTS_OUT_ORDER if c in df.columns])
