"""Backward as-of join — the time-series operator Spark lacks natively.

Semantics (matching DuckDB/kdb/pandas ``merge_asof``): each left row is
matched to the single right row with the same key and the greatest
right-timestamp ≤ the left row's timestamp.

The implementation is the scale-grade union+window form, NOT a range
join: tag both inputs, union them, and run ONE window pass per key
ordered by (ts, side) with ``last(..., ignorenulls)`` carrying the most
recent right-side payload forward. Cost is a single hash shuffle on the
key plus a per-partition sort — linear in rows, no candidate-pair
explosion, no broadcast requirement on either side; this is the shape
that survives a 100 TB fact against a 1 TB rate table. (A range/ASOF
join in Spark would otherwise plan as BroadcastNestedLoop or an
interval-bucket explode — see operators/intervals.py for that
alternative when the right side is interval-keyed rather than
event-keyed.)
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    on: str | Sequence[str],
    left_ts: str,
    right_ts: str,
    payload_cols: Sequence[str],
    tiebreak_col: str | None = None,
    direction: str = "backward",
) -> DataFrame:
    """Left rows + the latest right payload at-or-before their timestamp
    (``direction="backward"``, the default) or the earliest right payload
    at-or-after it (``direction="forward"`` — pandas
    ``merge_asof(direction='forward')`` semantics).

    ``payload_cols`` are the right-side columns carried onto matched left
    rows (null when no right row precedes/follows). The payload travels
    as ONE struct with ONE ``last(ignorenulls)`` carry — the struct is
    non-null for every right row even when individual payload values are
    legitimately NULL, so (a) a NULL payload value is preserved rather
    than silently replaced by an older right row's value, and (b) all
    payload columns are sourced from the SAME right row (row-atomic
    matching, exactly ``merge_asof``/DuckDB ASOF semantics). When
    several right rows share (key, right_ts), ``tiebreak_col`` makes the
    pick deterministic (the greatest value wins, compared in the
    column's native type — string ids, timestamps and numerics all
    order correctly) — REQUIRED for cross-engine hash parity; without it
    the winner is sort-order luck, exactly the nondeterminism the
    reference's min/max-over-first convention avoids (SURVEY §7.4.3).
    The forward form is the same single window pass with the sort order
    reversed — identical scale shape.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    keys = [on] if isinstance(on, str) else list(on)
    l_cols = [c for c in left.columns if c not in keys and c != left_ts]
    payload_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in payload_cols]
    )
    if tiebreak_col is not None:
        tb = F.col(tiebreak_col)  # native type: any orderable column works
        tb_null = F.lit(None).cast(right.schema[tiebreak_col].dataType)
    else:
        tb = F.lit(0)
        tb_null = F.lit(None).cast("int")
    tagged_left = left.select(
        *keys,
        F.col(left_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        *[F.col(c) for c in l_cols],
        F.lit(None).cast(payload_type).alias("_r"),
        tb_null.alias("_tb"),
    )
    tagged_right = right.select(
        *keys,
        F.col(right_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in l_cols],
        F.struct(*[F.col(c).alias(c) for c in payload_cols]).alias("_r"),
        tb.alias("_tb"),
    )
    # right rows sort BEFORE left rows at equal ts (side desc) so the
    # inclusive bound holds in either direction; among equal-ts right
    # rows the greatest tiebreak sorts last and therefore wins the
    # ignorenulls-last carry. Forward = the same pass over reversed ts.
    ts_order = F.col("_ts").asc() if direction == "backward" else F.col("_ts").desc()
    w = (
        Window.partitionBy(*keys)
        .orderBy(ts_order, F.col("_side").desc(), F.col("_tb").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    unioned = tagged_left.unionByName(tagged_right)
    carried = unioned.select(
        "*",
        F.last("_r", ignorenulls=True).over(w).alias("_asof"),
    )
    return carried.where(F.col("_side") == 0).select(
        *keys,
        F.col("_ts").alias(left_ts),
        *[F.col(c) for c in l_cols],
        *[F.col("_asof").getField(c).alias(c) for c in payload_cols],
    )
