"""Skew mitigation primitives for hot keys.

AQE's skew-join splitting handles most cases at runtime
(``spark.sql.adaptive.skewJoin.enabled`` is on in the session factory);
these helpers cover the two places AQE can't:

- ``salted_aggregate``: two-phase aggregation for HOT GROUP KEYS — the
  classic Mon-morning / flagship-branch problem. Phase 1 aggregates on
  (key, salt) spreading one hot key over N reducers; phase 2 merges the
  N partials. Works for any algebraic agg (sum/count/min/max).
- ``salted_broadcast_left``: replicate-broadcast join where the SMALL
  side is exploded over the salt space — for when the big side must
  keep its salted key.

Salts are deterministic (hash of a secondary column), so results are
reproducible run-to-run.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def with_salt(df: DataFrame, salt_src: Column, n_salts: int = 16) -> DataFrame:
    """Deterministic salt in [0, n_salts) from a secondary column."""
    return df.withColumn("_salt", F.pmod(F.xxhash64(salt_src), F.lit(n_salts)))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_src: Column,
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase agg: groupBy(keys + salt) → groupBy(keys).

    ``aggs``: output column → (how, source column), how ∈
    sum|count|min|max ("count" ignores its source). The partial for
    ``count`` merges as a sum in phase 2 (counts add).
    """
    phase1_fn = {"sum": F.sum, "min": F.min, "max": F.max}
    merge_fn = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
    bad = [how for how, _src in aggs.values() if how not in merge_fn]
    if bad:
        raise ValueError(f"non-algebraic aggs not salt-safe: {bad}")

    salted = with_salt(df, salt_src, n_salts)
    phase1 = salted.groupBy(*keys, "_salt").agg(
        *[
            (
                F.count(F.lit(1)) if how == "count" else phase1_fn[how](F.col(src))
            ).alias(f"_p_{out}")
            for out, (how, src) in aggs.items()
        ]
    )
    return phase1.groupBy(*keys).agg(
        *[merge_fn[how](F.col(f"_p_{out}")).alias(out) for out, (how, _src) in aggs.items()]
    )


def salted_broadcast_left(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 16,
) -> DataFrame:
    """big ⋈ small on ``key`` with the small side replicated per salt —
    the big side's hot key spreads over n_salts tasks."""
    salted_big = big.withColumn(
        "_salt", F.pmod(F.xxhash64(F.monotonically_increasing_id()), F.lit(n_salts))
    )
    exploded_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return (
        salted_big.join(F.broadcast(exploded_small), [key, "_salt"], "left")
        .drop("_salt")
    )


def key_skew_profile(
    df: DataFrame,
    key_col: str,
    top_k: int = 10,
    n_partitions: int = 32,
) -> DataFrame:
    """Key-distribution diagnosis for a planned groupBy/join key — the
    report that decides whether :func:`salted_aggregate` is needed and
    with how many salts, BEFORE the job hits the hot-key wall. Per
    top-``top_k`` key: row count, corpus share, and the suggested salt
    factor ``ceil(share × n_partitions)`` (how many reducers one key's
    rows would need to spread evenly — 1 means no salting required),
    computed with pure integer math so both engines agree exactly.

    Scale shape: ONE keyed count agg (map-side partials), a scalar
    total folded in the same frame via a window over the tiny per-key
    result, top-k via rank. The per-key frame is |distinct keys| rows,
    not data rows."""
    from pyspark.sql import Window

    per_key = df.groupBy(F.col(key_col).alias("key")).agg(
        F.count(F.lit(1)).alias("n_rows")
    )
    wt = Window.partitionBy()
    wr = Window.orderBy(F.col("n_rows").desc(), F.col("key").asc())
    totaled = per_key.withColumn("total", F.sum("n_rows").over(wt))
    from pos_pipeline_core_etl_spark.functions.rounding import hround

    return (
        totaled.withColumn("rank", F.row_number().over(wr))
        .where(F.col("rank") <= top_k)
        .select(
            "rank",
            F.col("key").cast("string").alias("key"),
            "n_rows",
            hround(F.col("n_rows") / F.col("total"), 6).alias("share"),
            F.expr(
                f"CAST((n_rows * {n_partitions} + total - 1) DIV total"
                " AS BIGINT)"
            ).alias("suggested_salts"),
        )
        .orderBy("rank")
    )
