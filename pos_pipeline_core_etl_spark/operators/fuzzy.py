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


def deletion_variants_col(key: str) -> Column:
    """Array of D1 variants of column ``key``: the key itself plus every
    single-character deletion, deduped. Empty keys yield [key]."""
    variants = (
        f"array_distinct(concat(array({key}), "
        f"transform(sequence(1, length({key})), "
        f"i -> concat(substring({key}, 1, i-1), "
        f"substring({key}, i+1, length({key}))))))"
    )
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
    for max_distance=1 by the deletion-neighborhood identity; for 0 it
    degenerates to exact duplicate keys)."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.col(key_col).alias("k"),
        F.explode(deletion_variants_col(key_col)).alias("variant"),
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
) -> DataFrame:
    """(variant, n_keys) for every deletion variant shared by more than
    ``max_bucket_size`` keys — the stop-variant population the blocking
    stage refuses to expand (observability twin of
    ``minhash_lsh_overflow``)."""
    v = df.select(
        F.col(id_col).alias("id"),
        F.explode(deletion_variants_col(key_col)).alias("variant"),
    )
    return (
        v.groupBy("variant")
        .agg(F.count_distinct("id").alias("n_keys"))
        .where(F.col("n_keys") > max_bucket_size)
    )
