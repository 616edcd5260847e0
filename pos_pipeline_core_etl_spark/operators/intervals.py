"""Date-interval algebra for incremental processing (SURVEY §2.8, §2.12).

Reference parity: ``/root/reference/src/pos_core/etl/utils.py:94-242``
— inclusive ``(start, end)`` date tuples with merge / subtract / cover
/ chunk operations. These drive WHICH partitions a run must (re)build;
the sets are tiny (per-branch request windows), so this stays
driver-side Python by design — the data-sized analog is Parquet
partition pruning on ``operating_date``.
"""

from __future__ import annotations

import datetime as dt
from collections.abc import Iterable, Iterator

Interval = tuple[dt.date, dt.date]


def _check(iv: Interval) -> Interval:
    start, end = iv
    if start > end:
        raise ValueError(f"interval start {start} after end {end}")
    return iv


def merge_intervals(intervals: Iterable[Interval]) -> list[Interval]:
    """Union of inclusive intervals; ranges that touch (±1 day) merge."""
    ivs = sorted(_check(iv) for iv in intervals)
    out: list[Interval] = []
    for start, end in ivs:
        if out and start <= out[-1][1] + dt.timedelta(days=1):
            out[-1] = (out[-1][0], max(out[-1][1], end))
        else:
            out.append((start, end))
    return out


def subtract_intervals(target: Interval, covered: Iterable[Interval]) -> list[Interval]:
    """Gaps of ``target`` not covered — the "what's missing" primitive."""
    start, end = _check(target)
    gaps: list[Interval] = []
    cursor = start
    for c_start, c_end in merge_intervals(covered):
        if c_end < cursor:
            continue
        if c_start > end:
            break
        if c_start > cursor:
            gaps.append((cursor, min(c_start - dt.timedelta(days=1), end)))
        cursor = max(cursor, c_end + dt.timedelta(days=1))
        if cursor > end:
            return gaps
    if cursor <= end:
        gaps.append((cursor, end))
    return gaps


def is_interval_covered(target: Interval, covered: Iterable[Interval]) -> bool:
    return not subtract_intervals(target, covered)


def iter_chunks(start: dt.date, end: dt.date, max_days: int = 180) -> Iterator[Interval]:
    """Split an inclusive range into ≤ max_days chunks (ingestion batching)."""
    if max_days < 1:
        raise ValueError("max_days must be >= 1")
    _check((start, end))
    cursor = start
    while cursor <= end:
        chunk_end = min(cursor + dt.timedelta(days=max_days - 1), end)
        yield (cursor, chunk_end)
        cursor = chunk_end + dt.timedelta(days=1)


def bucketed_range_join(
    fact,
    date_col: str,
    ranges,
    from_col: str = "valid_from",
    to_col: str = "valid_to",
    open_end_cap: str = "2005-01-01",
):
    """Scale path for point-in-interval joins: EQUI-join on a month
    bucket instead of a nested-loop range predicate.

    Each range row explodes into its covered month buckets (dim-side
    fan-out only — bounded by range length / grain); the fact computes
    its bucket as a pure column; the join is a hash equi-join on the
    bucket followed by the exact containment filter. The fact shuffles
    at most once on the bucket key — no BroadcastNestedLoopJoin, so this
    survives a validity dimension too large to broadcast. Inner-join
    semantics (every output row passed containment); recover unmatched
    fact rows with a left_anti on the same bucket join if needed.

    Open-ended ranges (NULL ``to_col``) are capped at ``open_end_cap``
    for bucket generation only — containment still treats NULL as
    unbounded, so the cap must be ≥ the fact's max date.
    """
    from pyspark.sql import functions as F

    d = F.col(date_col).cast("date")
    to_capped = F.coalesce(F.col(to_col), F.lit(open_end_cap).cast("date"))
    exploded = ranges.select(
        *ranges.columns,
        F.explode(
            F.sequence(
                F.date_trunc("month", F.col(from_col)).cast("date"),
                F.date_trunc("month", to_capped).cast("date"),
                F.expr("interval 1 month"),
            )
        ).alias("__bucket"),
    )
    bucketed_fact = fact.withColumn("__bucket", F.date_trunc("month", d).cast("date"))
    return (
        bucketed_fact.join(exploded, "__bucket")
        .where(
            (d >= F.col(from_col))
            & (F.col(to_col).isNull() | (d <= F.col(to_col)))
        )
        .drop("__bucket")
    )
