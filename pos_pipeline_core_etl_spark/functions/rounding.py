"""Cross-engine deterministic rounding.

Spark's ``round()`` rounds the shortest decimal string representation
(BigDecimal HALF_UP), DuckDB rounds the binary double — they disagree on
repr-boundary values (e.g. 37704.575). Both the Spark plans and the
DuckDB oracle SQL therefore use the same pure-arithmetic form

    sign(x) * floor(abs(x) * 10^n + 0.5) / 10^n

which is bit-identical IEEE math in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def hround(col: Column, digits: int = 2) -> Column:
    p = F.lit(float(10**digits))
    return F.signum(col) * F.floor(F.abs(col) * p + F.lit(0.5)) / p


def hround_sql(expr: str, digits: int = 2) -> str:
    p = float(10**digits)
    return f"(SIGN({expr}) * FLOOR(ABS({expr}) * {p} + 0.5) / {p})"
