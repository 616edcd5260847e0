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
