"""Deterministic corpus-sampling operators: train/val/test split,
per-source quota capping, and shuffle-shard assignment.

All three use the repo's md5-hash selector convention (md5 hex prefix →
BIGINT, engine-reproducible — same as ``stratified_sample`` /
``bounded_sample``) with a per-operator salt so the selectors are
mutually independent: a doc's split assignment must not correlate with
whether the quota kept it or which shard it shuffles into.

Why hash-based, not rank-based: a hash split is STABLE under corpus
growth and repartitioning — adding documents never flips an existing
doc's split/shard, which is the property training pipelines need for
reproducible eval sets and incremental re-runs. A rank/percentile split
reshuffles everything whenever the corpus changes.

Scale shape (100 TB): the split and the shard assignment are pure
map-side projections — ZERO shuffles. The quota cap is the only
shuffling operator, and its window partitions by (source, shard), never
by source alone: a hot domain holding 10% of a 100 TB corpus would
otherwise sort on one task. Sharding the quota keeps every window
partition ≤ |domain| / n_shards and still yields an exact global cap of
``cap_per_shard × n_shards`` whenever each shard fills (raise the shard
count with cluster size; per-shard caps stay exact and deterministic).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# train/val/test per-mille boundaries: < TRAIN → train, < VAL → validation
SPLIT_MOD = 1000
SPLIT_TRAIN = 980
SPLIT_VAL = 990

# per-source quota: QUOTA_SHARDS independent shards, CAP_PER_SHARD each
QUOTA_SHARDS = 4
CAP_PER_SHARD = 4  # global per-source cap = 16 when shards fill

SHUFFLE_SHARDS = 8


def hash_selector(col: Column, salt: str, modulus: int) -> Column:
    """md5-hex-prefix selector in [0, modulus): deterministic, engine-
    reproducible, and independent across salts."""
    h = F.md5(F.concat(F.lit(f"{salt}:"), col.cast("string")))
    return F.conv(F.substring(h, 1, 4), 16, 10).cast("long") % modulus


def hash_selector_sql(expr: str, salt: str, modulus: int) -> str:
    """DuckDB twin of :func:`hash_selector` (bit-identical)."""
    return (
        f"CAST(('0x' || substr(md5('{salt}:' || CAST({expr} AS VARCHAR)), 1, 4))"
        f" AS BIGINT) % {modulus}"
    )


def train_split(docs: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Assign every document a stable train/validation/test split.

    98/1/1 per-mille boundaries on the salted hash selector; adding or
    removing other documents never changes an existing assignment.
    Pure projection — zero shuffles at any corpus size.
    """
    sel = hash_selector(F.col(id_col), "split", SPLIT_MOD)
    split = (
        F.when(sel < SPLIT_TRAIN, F.lit("train"))
        .when(sel < SPLIT_VAL, F.lit("validation"))
        .otherwise(F.lit("test"))
    )
    return docs.select(F.col(id_col), F.col("source"), split.alias("split"))


def domain_quota(
    docs: DataFrame,
    id_col: str = "doc_id",
    domain_col: str = "source",
    shards: int = QUOTA_SHARDS,
    cap_per_shard: int = CAP_PER_SHARD,
) -> DataFrame:
    """Cap documents per domain/source to ``shards × cap_per_shard``,
    keeping a deterministic hash-ranked subset.

    The keep-set is selected by ranking docs inside (domain, shard) on
    an independent salted hash (then id as total tie-break), so the
    survivors are a uniform pseudo-random sample of the domain — not
    "first N by id", which would bias toward old documents.

    Scale: ONE shuffle on (domain, shard). Window partitions are
    bounded by |domain| / shards — no hot-domain single-task sort.
    """
    sel = hash_selector(F.col(id_col), "quota", SPLIT_MOD)
    shard = hash_selector(F.col(id_col), "qshard", shards)
    w = Window.partitionBy(domain_col, "shard_id").orderBy("quota_sel", id_col)
    ranked = (
        docs.select(
            F.col(id_col),
            F.col(domain_col),
            shard.alias("shard_id"),
            sel.alias("quota_sel"),
        )
        .withColumn("rnk", F.row_number().over(w))
        .where(F.col("rnk") <= cap_per_shard)
    )
    return ranked.select(id_col, domain_col, "shard_id", F.col("rnk").cast("long").alias("rnk"))


def shuffle_shards(
    docs: DataFrame, id_col: str = "doc_id", n_shards: int = SHUFFLE_SHARDS
) -> DataFrame:
    """Deterministic global shuffle for training export: assign each doc
    a shard and a position within the shard, both hash-derived.

    This is how a 100 TB corpus is written out "shuffled" without a
    global sort: shard assignment is a map-side projection, the
    within-shard ordering is a window partitioned BY shard (bounded
    partitions, parallel across shards), and concatenating shards in
    shard order yields a reproducible pseudo-random permutation of the
    corpus. Writers then emit one (or a few) files per shard.
    """
    shard = hash_selector(F.col(id_col), "shuf", n_shards)
    pos_key = hash_selector(F.col(id_col), "pos", SPLIT_MOD * SPLIT_MOD)
    w = Window.partitionBy("shard_id").orderBy("pos_key", id_col)
    return (
        docs.select(F.col(id_col), shard.alias("shard_id"), pos_key.alias("pos_key"))
        .withColumn("pos", F.row_number().over(w).cast("long"))
        .select(id_col, "shard_id", "pos")
    )


# target corpus mixture, integer percent shares (sum 100)
MIXTURE_TARGETS = {"en": 50, "es": 20, "fr": 15, "de": 10, "zh": 5}


def mixture_plan(
    docs: DataFrame,
    targets: dict[str, int] | None = None,
    lang_col: str = "lang",
) -> DataFrame:
    """Source-mixing plan: the largest downsampled corpus matching the
    target language mix WITHOUT upsampling any language.

    Standard mixture math, all INTEGER arithmetic (engine-exact):
    budget ``T = min over langs floor(100 * n_lang / share_lang)`` (the
    binding language keeps 100%), per-lang target ``floor(T * share /
    100)`` and hash keep-threshold ``floor(1000 * T * share / (100 *
    n_lang))`` per-mille. Languages outside the target mix get no row
    (they are dropped entirely by :func:`mixture_sample`).

    Scale: ONE count aggregation over the corpus (map-side partials);
    the plan itself is languages-sized. The min over languages is
    computed relationally (a 5-row cross-join-free agg), not on the
    driver.
    """
    targets = MIXTURE_TARGETS if targets is None else targets
    share = F.lit(None).cast("long")
    for lang, pct in targets.items():
        share = F.when(F.col(lang_col) == lang, F.lit(pct)).otherwise(share)
    counts = (
        docs.select(F.col(lang_col).alias("lang"), share.alias("share"))
        .where(F.col("share").isNotNull())
        .groupBy("lang", "share")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )
    budget = counts.agg(
        F.min(F.expr("CAST(FLOOR(100 * n_docs / share) AS BIGINT)")).alias("budget")
    )
    return (
        counts.crossJoin(F.broadcast(budget))
        .select(
            "lang",
            "n_docs",
            F.col("share").alias("target_share"),
            F.expr("CAST(FLOOR(budget * share / 100) AS BIGINT)").alias("n_target"),
            F.least(
                F.lit(1000),
                F.expr("CAST(FLOOR(1000 * budget * share / (100 * n_docs)) AS BIGINT)"),
            ).alias("keep_permille"),
        )
    )


def mixture_sample(
    docs: DataFrame,
    targets: dict[str, int] | None = None,
    id_col: str = "doc_id",
    lang_col: str = "lang",
) -> DataFrame:
    """Apply :func:`mixture_plan`: keep each doc iff its salted hash
    selector falls under its language's keep-threshold. The plan is
    broadcast (languages-sized); the filter is map-side — the corpus
    is never shuffled."""
    plan = mixture_plan(docs, targets, lang_col).select(
        F.col("lang").alias(lang_col), "keep_permille"
    )
    sel = hash_selector(F.col(id_col), "mix", SPLIT_MOD)
    return (
        docs.join(F.broadcast(plan), lang_col)
        .where(sel < F.col("keep_permille"))
        .select(id_col, lang_col, "source")
    )
