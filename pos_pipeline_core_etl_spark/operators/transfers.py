"""Transfers mart: category × branch money pivot with TOTAL row/col.

Reference parity: ``build_transfers_pivot`` (``/root/reference/src/
pos_core/etl/marts/transfers.py:211-246``) — sum of ``Monto`` per
(category, destination branch), plus grand-total row and column.

Scale design: the reference reindexes a fixed 14×7 pandas pivot and
appends TOTAL margins. Here the same result is ONE ``cube()`` pass —
Spark computes all four grouping sets (cell, row total, col total,
grand total) with a single shuffle and map-side partials, and the
result stays long/relational (never a driver-side matrix), so it works
at any number of branches. ``transfers_pivot_wide`` is the tiny
presentation-layer pivot for parity with the reference's Excel export.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround

TOTAL_LABEL = "TOTAL"


def build_transfers_cube(fact: DataFrame) -> DataFrame:
    """fact_transfers_line → long-format pivot incl. TOTAL margins.

    Output: (categoria, sucursal_destino, monto) where either key may be
    'TOTAL' (margin rows). ``monto`` is the rounded cost sum.
    """
    return (
        fact.cube("departamento", "sucursal_destino")
        .agg(hround(F.sum("costo"), 2).alias("monto"), F.count(F.lit(1)).alias("n_lines"))
        .select(
            F.coalesce(F.col("departamento"), F.lit(TOTAL_LABEL)).alias("categoria"),
            F.coalesce(F.col("sucursal_destino"), F.lit(TOTAL_LABEL)).alias(
                "sucursal_destino"
            ),
            "monto",
            "n_lines",
        )
    )


def transfers_pivot_wide(cube_df: DataFrame):
    """Presentation-layer wide pivot (reference Excel-export shape).

    The cube output is mart-grain tiny (|categories| × |branches|), so a
    driver-side pandas pivot is appropriate here — this is formatting,
    not computation.
    """
    pdf = cube_df.toPandas()
    wide = pdf.pivot(index="categoria", columns="sucursal_destino", values="monto")
    # TOTAL row/col last
    rows = [r for r in wide.index if r != TOTAL_LABEL] + [TOTAL_LABEL]
    cols = [c for c in wide.columns if c != TOTAL_LABEL] + [TOTAL_LABEL]
    return wide.reindex(index=rows, columns=cols)
