"""Fuzzy-key entity resolution via deletion-neighborhood blocking
(FastSS / SymSpell; LLM-pipeline + ETL extension — no reference
analog; the reference joins only on exact keys).

The classic scale problem: match records whose join keys differ by a
typo. The quadratic form (``levenshtein`` across all pairs) is
unusable beyond ~10⁵ rows; the deletion-neighborhood identity makes it
relational: for strings a, b,

    levenshtein(a, b) <= 1  =>  D1(a) ∩ D1(b) ≠ ∅

where D1(s) = {s} ∪ {s with one character deleted}. So: explode each
key into its ≤ len+1 deletion variants (map-side, bounded by key
length), equi-join on the variant (ONE keyed shuffle), and verify the
exact edit distance on candidates only — the same
candidate-then-verify discipline as the MinHash/SimHash/containment
families, with the same capped-bucket + overflow-observability
contract (a degenerate "stop variant" shared by thousands of keys is
excluded, not quadratic-exploded). The variant match over-generates
(e.g. transposed adjacent characters share a variant at distance 2),
which is exactly why the verify stage exists — pinned by test.

100 TB shape: explode factor = key length (~20), one shuffle on the
variant, capped in-bucket pair expansion, `levenshtein` (JVM
built-in) only on candidates.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

FUZZY_MAX_BUCKET = 50

# Delete-2 blocking keeps buckets hotter than delete-1 (every variant is
# reachable from ~L²/2 more keys), so its cap is correspondingly larger.
# Measured on the sf0.01 customer fixture: the audit subset has total
# recall at 150 while the handful of boilerplate mega-variants (up to
# 294 keys) stay excluded and land in the overflow report.
FUZZY_D2_MAX_BUCKET = 150


def deletion_variants_col(key: str, depth: int = 1) -> Column:
    """Array of deletion-neighborhood variants of column ``key``: the key
    itself plus every string reachable by deleting up to ``depth``
    characters (depth 1 or 2), deduped. Empty keys yield [key].

    FastSS identity: levenshtein(a, b) <= d implies the depth-d
    neighborhoods intersect (align the edit script; each substitution
    deletes one char from both sides, each insert/delete one char from
    one side), so an equi-join on the variant is candidate-complete for
    distance d. Explode factor: 1 + L for depth 1; 1 + L + L(L-1)/2 for
    depth 2 (≈190 extra variants at L=20 — the measured cost of catching
    two-character typos relationally)."""
    if depth not in (1, 2):
        raise ValueError(f"depth must be 1 or 2, got {depth}")
    del1 = (
        f"transform(sequence(1, length({key})), "
        f"i -> concat(substring({key}, 1, i-1), "
        f"substring({key}, i+1, length({key}))))"
    )
    parts = [f"array({key})", del1]
    if depth == 2:
        del2 = (
            f"CASE WHEN length({key}) >= 2 THEN "
            f"flatten(transform(sequence(1, length({key}) - 1), "
            f"i -> transform(sequence(i + 1, length({key})), "
            f"j -> concat(substring({key}, 1, i-1), "
            f"substring({key}, i+1, j-i-1), "
            f"substring({key}, j+1, length({key})))))) "
            f"ELSE array() END"
        )
        parts.append(del2)
    variants = f"array_distinct(concat({', '.join(parts)}))"
    return F.expr(
        f"CASE WHEN length({key}) = 0 THEN array({key}) ELSE {variants} END"
    )


def fuzzy_key_pairs(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_distance: int = 1,
    max_bucket_size: int | None = FUZZY_MAX_BUCKET,
) -> DataFrame:
    """(id_a, id_b, key_a, key_b, dist) for all pairs with
    levenshtein(key_a, key_b) <= ``max_distance`` (candidate-complete
    for max_distance in {1, 2} by the deletion-neighborhood identity;
    for 0 it degenerates to exact duplicate keys). Distance 2 explodes
    the depth-2 neighborhood (cost model in
    :func:`deletion_variants_col`); callers should pair it with the
    larger ``FUZZY_D2_MAX_BUCKET`` cap."""
    if max_distance > 2:
        raise ValueError(
            f"max_distance must be <= 2 (depth-{max_distance} deletion "
            "neighborhoods explode combinatorially; chain through a "
            "d<=2 pass or use the MinHash family instead)"
        )
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("k"),
        F.explode(
            deletion_variants_col(key_col, depth=max(1, max_distance))
        ).alias("variant"),
    )
    keep = F.size("ids") > 1
    if max_bucket_size is not None:
        keep = keep & (F.size("ids") <= max_bucket_size)
    grouped = (
        v.groupBy("variant")
        .agg(F.sort_array(F.collect_set(F.struct("id", "k"))).alias("ids"))
        .where(keep)
    )
    from pos_pipeline_core_etl_spark.operators.dedup import upper_triangle_pairs

    pair_structs = upper_triangle_pairs(
        build=lambda x, y: F.struct(
            x["id"].alias("id_a"),
            y["id"].alias("id_b"),
            x["k"].alias("key_a"),
            y["k"].alias("key_b"),
        )
    )
    cands = (
        grouped.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b", "p.key_a", "p.key_b")
        .distinct()
    )
    dist = F.levenshtein("key_a", "key_b")
    return cands.select(
        "id_a", "id_b", "key_a", "key_b", dist.cast("long").alias("dist")
    ).where(F.col("dist") <= max_distance)


def fuzzy_key_overflow(
    df: DataFrame,
    id_col: str,
    key_col: str,
    max_bucket_size: int = FUZZY_MAX_BUCKET,
    depth: int = 1,
) -> DataFrame:
    """(variant, n_keys) for every depth-``depth`` deletion variant
    shared by more than ``max_bucket_size`` keys — the stop-variant
    population the blocking stage refuses to expand (observability twin
    of ``minhash_lsh_overflow``)."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.explode(deletion_variants_col(key_col, depth=depth)).alias("variant"),
    )
    return (
        v.groupBy("variant")
        .agg(F.count_distinct("id").alias("n_keys"))
        .where(F.col("n_keys") > max_bucket_size)
    )
