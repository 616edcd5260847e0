"""Mergeable cardinality / frequency sketches (KMV, Count-Min).

The repo already demonstrates the tolerance-checked sketch path
(``plans/analytics.py::events_cardinality_sketch`` — HLL++ via
``approx_count_distinct``, oracle asserts a 2% envelope).  This module
adds the *deterministic* sketch family: K-Minimum-Values distinct
sketches and Count-Min frequency sketches built on the same
md5-hex-prefix hashing every dedup operator here uses, so the DuckDB
oracle reproduces the sketch BIT-EXACTLY — including the property that
actually matters at 100 TB, **mergeability**: a sketch built
shard-by-shard and merged equals the single-pass sketch, value for
value.  (``plans/sketch_queries.py::sketch_kmv_merge`` runs the Spark
side sharded and the oracle single-pass; the driver's hash match IS the
merge proof, cross-engine.)

Why this matters at scale: exact per-group ``COUNT(DISTINCT key)`` over
100 TB shuffles every distinct key to its group's reducer.  A KMV
sketch caps the per-(group, shard) state at k 64-bit values; shards
combine by re-taking the k smallest of the union — associative,
commutative, constant-size, i.e. a partial-aggregate-friendly shape
(union of shard top-ks always contains the global top-k, because each
of the k globally-smallest hashes is among the k smallest of its own
shard).  Count-Min is the frequency analog: depth×width integer
counters that add across shards; estimates only ever over-count.

Estimator references (public): Bar-Yossef et al. 2002 (KMV /
"distinct values in a stream"), Beyer et al. 2007 (the unbiased
(k-1)/h_k form used here), Cormode & Muthukrishnan 2005 (Count-Min).

The reference repo has no sketch surface (its aggregations are exact
pandas group-bys, e.g. etl/payments.py's sum/max pivots); this module
is part of the driver-mandated scale extension, same family as the
HLL++ query above.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.functions.rounding import hround, hround_sql

# 60-bit hash: first 15 hex chars of md5 — the widest prefix that fits a
# signed 64-bit integer in both engines (16 chars could overflow the
# BIGINT cast on a leading f).  Hash space M = 16^15 = 2^60.
M60 = float(2**60)

# Shard fan-out for the two-level (per-shard k-smallest → final rank
# over the bounded shards×k / shards×top union) rank pulls below.  The
# union of per-shard top-ks always contains the global top-k, so the
# final cut is value-identical to a global sort — without ever
# single-partitioning an unbounded frame (VERDICT r10 #1/#2).
RANK_SHARDS = 32


def h60(col: Column) -> Column:
    """Stable 60-bit integer hash (same construction as
    ``dedup.shingle_id`` / the winnowing window id, widened to 15 hex
    chars)."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


H60_SQL = "CAST(('0x' || substr(md5({s}), 1, 15)) AS BIGINT)"


def kmv_estimate_col(n_vals: Column, h_k: Column, k: int) -> Column:
    """The Beyer et al. unbiased estimator (k-1) * M / h_(k), falling
    back to the exact sketch size when the domain never filled the
    sketch.  Pure double arithmetic, identical IEEE ops in DuckDB."""
    est = F.lit(float(k - 1)) * F.lit(M60) / F.greatest(h_k, F.lit(1)).cast("double")
    return F.when(n_vals < k, n_vals.cast("double")).otherwise(hround(est, 4))


def kmv_estimate_sql(n_vals: str, h_k: str, k: int) -> str:
    est = f"({float(k - 1)} * {M60}) / CAST(GREATEST({h_k}, 1) AS DOUBLE)"
    return (
        f"CASE WHEN {n_vals} < {k} THEN CAST({n_vals} AS DOUBLE) "
        f"ELSE {hround_sql(est, 4)} END"
    )


def kmv_sketch(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV sketch rows: the k smallest distinct 60-bit hashes
    of ``key_col`` → ``(group_col, h, rn)``.

    Physical shape: the DISTINCT collapses (group, hash) pairs with
    map-side partial aggregation first, so the row_number sort ranks
    the *cardinality*-sized set, never the raw row count.  At cluster
    scale the sharded form (:func:`kmv_merge_sketch`) is the intended
    path — per-shard sketches bound the sort input at shards × k.

    Null keys are dropped before hashing (ADVICE r10 #1: h60(NULL) is
    NULL and Spark's row_number sorts NULLS FIRST while DuckDB sorts
    NULLS LAST, so a null key would silently diverge the sketches
    cross-engine; the matching oracles carry ``WHERE key IS NOT NULL``).
    """
    hashed = (
        df.where(F.col(key_col).isNotNull())
        .select(group_col, h60(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return hashed.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)


def kmv_group_estimates(
    df: DataFrame, group_col: str, key_col: str, k: int = 64
) -> DataFrame:
    """Per-group exact distinct count + KMV estimate + relative error.

    Deterministic: the oracle recomputes the identical estimate, so the
    driver hash-checks the sketch VALUES, not a tolerance envelope.
    """
    sk = kmv_sketch(df, group_col, key_col, k)
    agg = sk.groupBy(group_col).agg(
        F.count("h").alias("n_vals"), F.max("h").alias("h_k")
    )
    exact = df.groupBy(group_col).agg(
        F.countDistinct(key_col).alias("n_exact")
    )
    est = kmv_estimate_col(F.col("n_vals"), F.col("h_k"), k)
    return (
        exact.join(agg, group_col)
        .select(
            group_col,
            "n_exact",
            F.lit(k).alias("kmv_k"),
            est.alias("kmv_estimate"),
            hround(F.abs(est - F.col("n_exact")) / F.col("n_exact"), 6).alias(
                "rel_err"
            ),
        )
    )


def kmv_merge_sketch(
    df: DataFrame,
    group_col: str,
    key_col: str,
    shard_col: Column,
    k: int = 64,
) -> DataFrame:
    """Shard-then-merge KMV: per-(group, shard) k-smallest sketches,
    merged by re-taking the k smallest of the union — the partial-
    aggregate shape a 1000-executor run would use.  Returns the same
    ``(group, h, rn)`` rows as :func:`kmv_sketch`; equality is proven
    (a) in tests by direct comparison and (b) cross-engine by
    ``sketch_kmv_merge``'s single-pass oracle."""
    hashed = (
        df.where(F.col(key_col).isNotNull())
        .select(
            group_col,
            shard_col.alias("shard"),
            h60(F.col(key_col).cast("string")).alias("h"),
        )
        .distinct()
    )
    per_shard = (
        hashed.withColumn(
            "rn",
            F.row_number().over(
                Window.partitionBy(group_col, "shard").orderBy("h")
            ),
        )
        .filter(F.col("rn") <= k)
        .drop("rn", "shard")
        .distinct()  # same hash may survive in several shards
    )
    w = Window.partitionBy(group_col).orderBy("h")
    return per_shard.withColumn("rn", F.row_number().over(w)).filter(
        F.col("rn") <= k
    )


def two_level_rank(
    df: DataFrame,
    order_by: list[Column],
    k: int,
    shard_col: Column,
    shards: int = RANK_SHARDS,
) -> DataFrame:
    """Deterministic top-k without a single-partition global sort: rank
    within ``shards`` deterministic shards first (a partitioned window
    — distributed), keep each shard's k best, then rank the bounded
    shards×k union.  Value-identical to a global ``row_number() <= k``
    because each of the k global winners is among the k best of its own
    shard.  Adds the final ``rn`` column (1..k)."""
    pre = F.row_number().over(
        Window.partitionBy("_shard").orderBy(*order_by)
    )
    pruned = (
        df.withColumn("_shard", F.pmod(shard_col, F.lit(shards)))
        .withColumn("_prn", pre)
        .filter(F.col("_prn") <= k)
        .drop("_prn", "_shard")
    )
    return pruned.withColumn(
        "rn", F.row_number().over(Window.orderBy(*order_by))
    ).filter(F.col("rn") <= k)


def kmv_jaccard(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """One-row frame: exact vs KMV-estimated Jaccard of two key sets.

    The estimator is the classic KMV set-operation rule: build the
    union sketch (k smallest of hash(A) ∪ hash(B)) and count how many
    of its members belong to both sets — |sketch ∩ A ∩ B| / |sketch|.
    Both engines rank the same hashes, so the estimate is
    deterministic.

    Physical shape (VERDICT r10 #1): the union sketch is pulled with
    :func:`two_level_rank` — per-shard k-smallest first, then the final
    rank over the bounded shards×k survivors — never an unpartitioned
    window over the full distinct-hash union.  Only the EXACT side
    (this query's verify twin by contract) scans the whole union, and
    it does so with distributed scalar aggregates."""
    a = (
        left.where(F.col(key_col).isNotNull())
        .select(h60(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )
    b = (
        right.where(F.col(key_col).isNotNull())
        .select(h60(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )
    tagged = (
        a.withColumn("in_a", F.lit(1)).withColumn("in_b", F.lit(0))
        .unionByName(
            b.withColumn("in_a", F.lit(0)).withColumn("in_b", F.lit(1))
        )
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    sk = two_level_rank(tagged, [F.col("h")], k, shard_col=F.col("h"))
    est = sk.agg(
        F.count("h").alias("sk_size"),
        F.sum((F.col("in_a") * F.col("in_b"))).alias("sk_both"),
    )
    exact = tagged.agg(
        F.sum("in_a").alias("n_a"),
        F.sum("in_b").alias("n_b"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("n_both"),
        F.count("h").alias("n_union"),
    )
    return exact.crossJoin(est).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        hround(F.col("n_both") / F.col("n_union"), 6).alias("jaccard_exact"),
        F.lit(k).alias("kmv_k"),
        hround(F.col("sk_both") / F.col("sk_size"), 6).alias("jaccard_kmv"),
    )


def kmv_setops(
    left: DataFrame,
    right: DataFrame,
    key_col: str,
    k: int = 64,
) -> DataFrame:
    """One-row frame: exact vs KMV-estimated UNION / INTERSECTION /
    DIFFERENCE cardinalities of two key sets — the full set-operation
    surface a single mergeable sketch buys (Beyer et al. 2007 §4):

    - ``union_kmv``: the standard (k-1)·M/h_k estimator on the union
      sketch (k smallest of hash(A) ∪ hash(B));
    - ``inter_kmv`` / ``aonly_kmv`` / ``bonly_kmv``: the union sketch is
      a uniform sample of the union, so each region's share of sketch
      members is an unbiased estimate of its share of the union —
      multiply by ``union_kmv``.

    When the union never fills the sketch the estimator degrades to
    EXACT by construction (the sketch IS the union, every ratio is the
    true ratio), so one formula covers both regimes.

    Scale shape: same as :func:`kmv_jaccard` — the union sketch is
    pulled with :func:`two_level_rank` (per-shard k-smallest, final
    rank over the bounded shards×k survivors); only the exact columns
    (the verify twin by contract) scan the full union, via distributed
    scalar aggregates.  At deployment the two sides' sketches would be
    maintained independently and merged (mergeability is proven
    cross-engine by ``sketch_kmv_merge``); estimating A∖B without ever
    co-locating A and B is exactly what exact COUNT(DISTINCT) cannot
    do at 100 TB."""
    a = (
        left.where(F.col(key_col).isNotNull())
        .select(h60(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )
    b = (
        right.where(F.col(key_col).isNotNull())
        .select(h60(F.col(key_col).cast("string")).alias("h"))
        .distinct()
    )
    tagged = (
        a.withColumn("in_a", F.lit(1)).withColumn("in_b", F.lit(0))
        .unionByName(
            b.withColumn("in_a", F.lit(0)).withColumn("in_b", F.lit(1))
        )
        .groupBy("h")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    sk = two_level_rank(tagged, [F.col("h")], k, shard_col=F.col("h"))
    est = sk.agg(
        F.count("h").alias("n_vals"),
        F.max("h").alias("h_k"),
        F.sum(F.col("in_a") * F.col("in_b")).alias("sk_both"),
        F.sum(F.col("in_a") * (F.lit(1) - F.col("in_b"))).alias("sk_aonly"),
        F.sum((F.lit(1) - F.col("in_a")) * F.col("in_b")).alias("sk_bonly"),
    )
    # coalesce: SUM over an empty union is NULL in both engines, but an
    # empty union's exact counts are semantically 0 (ADVICE r11 #1)
    exact = tagged.agg(
        F.coalesce(F.sum("in_a"), F.lit(0)).alias("n_a"),
        F.coalesce(F.sum("in_b"), F.lit(0)).alias("n_b"),
        F.count("h").alias("n_union"),
        F.coalesce(F.sum(F.col("in_a") * F.col("in_b")), F.lit(0)).alias(
            "n_inter"
        ),
    )
    union_est = kmv_estimate_col(F.col("n_vals"), F.col("h_k"), k)
    # empty-union guard (ADVICE r11 #1): with n_vals = 0 the region
    # share is 0/0 — report 0.0 (the regions of an empty union ARE
    # empty), never NULL; mirrored in SKETCH_KMV_SETOPS_SQL
    region = lambda cnt: F.when(  # noqa: E731
        F.col("n_vals") > 0,
        hround(cnt / F.col("n_vals") * union_est, 4),
    ).otherwise(F.lit(0.0))
    return exact.crossJoin(est).select(
        F.col("n_a").cast("long").alias("n_a"),
        F.col("n_b").cast("long").alias("n_b"),
        F.col("n_union").cast("long").alias("n_union"),
        F.col("n_inter").cast("long").alias("n_inter"),
        F.lit(k).alias("kmv_k"),
        union_est.alias("union_kmv"),
        region(F.col("sk_both")).alias("inter_kmv"),
        region(F.col("sk_aonly")).alias("aonly_kmv"),
        region(F.col("sk_bonly")).alias("bonly_kmv"),
    )


# ---------------------------------------------------------------------------
# Priority sampling (weighted)


def priority_sample_summary(
    df: DataFrame,
    key_col: str,
    weight_col: str,
    k: int = 64,
) -> DataFrame:
    """Weighted sample + unbiased subset-sum estimate via PRIORITY
    SAMPLING (Duffield, Lund & Thorup, JACM 2007) — the weighted member
    of the sketch family (round 12): KMV samples a key SET uniformly;
    this samples rows PROPORTIONALLY TO WEIGHT, the operation a
    training-data pipeline runs when it keeps k shards of a corpus by
    quality/length weight and still wants total-mass estimates.

    Construction (all basic IEEE ops — bit-exact cross-engine, no libm):
    each row's priority is ``w / u`` with ``u = (h+1)/2^60`` from the
    shared 60-bit key hash; the sample is the top-k by (priority desc,
    h asc); ``tau`` is the (k+1)-th priority and every sampled row
    estimates its weight as ``max(w, tau)`` — summing those is the DLT
    unbiased estimator of the TOTAL weight.  When the input has ≤ k
    rows, ``tau`` is 0 and the estimate degrades to EXACT, the same
    two-regime contract as the KMV estimator.

    Physical shape: the top-(k+1) selection is :func:`two_level_rank`
    (per-shard k+1 smallest-by-order, final rank over the bounded
    shards×(k+1) union) — per-shard priority heaps are exactly the
    mergeable state a sharded/streaming maintainer holds, so the
    driver's hash match against the single-pass oracle doubles as the
    mergeability proof, as with ``sketch_kmv_merge``.  One distributed
    scan for the exact totals (the verify twin), one for the sketch.

    One summary row: n_rows, k, tau, n_heavy (sampled rows whose own
    weight beats tau — kept exactly), exact vs estimated total weight,
    and the relative error, reported rather than hidden."""
    rows = df.where(
        F.col(key_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col).cast("double") > 0)
    ).select(
        h60(F.col(key_col).cast("string")).alias("h"),
        F.col(weight_col).cast("double").alias("w"),
    )
    ranked = two_level_rank(
        rows.withColumn("pr", priority_col()),
        [F.desc("pr"), F.col("h")],
        k + 1,
        shard_col=F.col("h"),
    )
    exact = rows.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("w"), F.lit(0.0)).alias("w_exact"),
    )
    return priority_summary_from_parts(exact, ranked, k)


def priority_col() -> Column:
    """Priority ``w / u`` with ``u = (h+1)/2^60``, written as one
    division then one multiplication IN THIS ORDER on every engine and
    every caller (one-shot and streaming maintainer) so the doubles are
    bit-identical — IEEE basic ops only, no libm."""
    return F.col("w") * (F.lit(M60) / (F.col("h") + F.lit(1)).cast("double"))


def priority_summary_from_parts(
    exact: DataFrame, ranked: DataFrame, k: int
) -> DataFrame:
    """Assemble the one-row DLT summary from its two mergeable parts —
    an exact-totals frame ``(n_rows, w_exact)`` and a ranked top-(k+1)
    frame ``(h, w, pr, rn)``.  Shared by :func:`priority_sample_summary`
    and the streaming maintainer's final readout
    (``streaming.events.run_streaming_priority_sample``), so the two
    paths cannot drift in estimator arithmetic."""
    tau = ranked.agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("pr"))), F.lit(0.0)
        ).alias("tau")
    )
    sample = ranked.where(F.col("rn") <= k)
    est = sample.crossJoin(F.broadcast(tau)).agg(
        F.count(F.lit(1)).alias("n_sample"),
        F.coalesce(
            F.sum(F.greatest(F.col("w"), F.col("tau"))), F.lit(0.0)
        ).alias("w_est"),
        F.coalesce(
            F.sum((F.col("w") >= F.col("tau")).cast("long")), F.lit(0)
        ).alias("n_heavy"),
        # empty input: the agg row still materializes (global agg), but
        # max over zero rows is NULL — report tau = 0 (nothing cut)
        F.coalesce(F.max("tau"), F.lit(0.0)).alias("tau"),
    )
    return exact.crossJoin(est).select(
        F.col("n_rows").cast("long").alias("n_rows"),
        F.lit(k).alias("sample_k"),
        F.col("n_sample").cast("long").alias("n_sample"),
        F.col("n_heavy").cast("long").alias("n_heavy"),
        hround(F.col("tau"), 4).alias("tau"),
        hround(F.col("w_exact"), 2).alias("w_total_exact"),
        hround(F.col("w_est"), 2).alias("w_total_estimate"),
        hround(
            F.when(
                F.col("w_exact") > 0,
                F.abs(F.col("w_est") - F.col("w_exact")) / F.col("w_exact"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("rel_err"),
    )


def priority_sample_summary_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    weight_col: str,
    k: int = 32,
) -> DataFrame:
    """Per-group (stratified) priority sampling — one DLT summary row
    PER GROUP: the operation behind "keep k documents per source by
    quality weight, still estimate each source's total mass".

    Same estimator arithmetic as :func:`priority_sample_summary`
    (priority ``w/u``, tau = per-group (k+1)-th, ``sum(max(w, tau))``
    — IEEE ×,÷ only, bit-exact cross-engine); the physical shape
    follows :func:`cms_estimates_grouped`, not the global form: the
    top-(k+1) selection is ONE partitioned window (the group is the
    shard — no two-level dance), every agg and join is keyed by the
    group, and nothing forces a broadcast (the tau/exact frames scale
    with group cardinality — the ``hist_quantiles_grouped`` rule)."""
    rows = df.where(
        F.col(group_col).isNotNull()
        & F.col(key_col).isNotNull()
        & F.col(weight_col).isNotNull()
        & (F.col(weight_col).cast("double") > 0)
    ).select(
        F.col(group_col).alias("g"),
        h60(F.col(key_col).cast("string")).alias("h"),
        F.col(weight_col).cast("double").alias("w"),
    )
    w_g = Window.partitionBy("g").orderBy(F.desc("pr"), F.col("h"))
    ranked = (
        rows.withColumn("pr", priority_col())
        .withColumn("rn", F.row_number().over(w_g))
        .filter(F.col("rn") <= k + 1)
    )
    exact = rows.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.coalesce(F.sum("w"), F.lit(0.0)).alias("w_exact"),
    )
    tau = ranked.groupBy("g").agg(
        F.coalesce(
            F.max(F.when(F.col("rn") == k + 1, F.col("pr"))), F.lit(0.0)
        ).alias("tau")
    )
    est = (
        ranked.where(F.col("rn") <= k)
        .join(tau, "g")
        .groupBy("g")
        .agg(
            F.count(F.lit(1)).alias("n_sample"),
            F.coalesce(
                F.sum(F.greatest(F.col("w"), F.col("tau"))), F.lit(0.0)
            ).alias("w_est"),
            F.coalesce(
                F.sum((F.col("w") >= F.col("tau")).cast("long")), F.lit(0)
            ).alias("n_heavy"),
            F.coalesce(F.max("tau"), F.lit(0.0)).alias("tau"),
        )
    )
    return (
        exact.join(est, "g")
        .select(
            F.col("g").alias(group_col),
            F.col("n_rows").cast("long").alias("n_rows"),
            F.lit(k).alias("sample_k"),
            F.col("n_sample").cast("long").alias("n_sample"),
            F.col("n_heavy").cast("long").alias("n_heavy"),
            hround(F.col("tau"), 4).alias("tau"),
            hround(F.col("w_exact"), 2).alias("w_total_exact"),
            hround(F.col("w_est"), 2).alias("w_total_estimate"),
            hround(
                F.when(
                    F.col("w_exact") > 0,
                    F.abs(F.col("w_est") - F.col("w_exact"))
                    / F.col("w_exact"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("rel_err"),
        )
    )


# ---------------------------------------------------------------------------
# Count-Min


def cms_bucket(key: Column, depth_idx: int, width: int) -> Column:
    """Row `depth_idx`'s bucket for a key: salted 60-bit hash mod width.
    ``pmod`` so Spark matches DuckDB's non-negative ``%`` on positives."""
    return F.pmod(h60(F.concat(F.lit(f"{depth_idx}:"), key)), F.lit(width))


def cms_counters(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 256
) -> DataFrame:
    """The depth×width counter table: ``(d, b, cnt)``.  One narrow
    shuffle of depth copies of the keyed counts; the result is at most
    depth·width rows regardless of input size — the broadcastable side
    of every estimate join."""
    key = F.col(key_col).cast("string")
    df = df.where(F.col(key_col).isNotNull())
    tall = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("x")
    ).select("x.d", "x.b")
    return tall.groupBy("d", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimates(
    df: DataFrame,
    key_col: str,
    top: int = 20,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """CMS point estimates for the ``top`` most frequent keys (exact
    count desc, key asc — a total order, so the cut is deterministic).

    Output: key, exact count, CMS estimate (min over depth rows of the
    key's counter), and the overshoot (always ≥ 0 — CMS never
    under-counts; a test pins the invariant).  The counter table is
    broadcast into the estimate join.

    Physical shape (VERDICT r10 #2): the head selection is a two-level
    top-k — per-shard ``row_number() <= top`` over the distinct-key
    frame, then the final rank over the bounded shards×top union, with
    the same deterministic (exact count desc, key asc) total order at
    both levels — never a single-partition sort over all distinct keys."""
    key = F.col(key_col).cast("string")
    df = df.where(F.col(key_col).isNotNull())
    exact = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("exact_cnt"))
    # r12 (guide §2.3 — aggregate before you shuffle): the counter
    # table is DERIVED from the exact per-key counts instead of
    # re-scanning and 4×-exploding every input row (cms_counters —
    # kept for the streaming maintainer, whose input is the raw batch):
    # cnt(d, b) = Σ_{keys hashing to b} exact_cnt, bit-identical by
    # construction.  The explode now runs over distinct keys (plan:
    # the exact agg's exchange is reused across both legs, so the
    # input is scanned ONCE — profile: sketch_cms_grouped
    # 2.7 executor-sec → see OPTIMIZATION_r12.md).
    counters = (
        exact.select(
            "exact_cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            cms_bucket(key, d, width).alias("b"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("x"),
        )
        .select("exact_cnt", "x.d", "x.b")
        .groupBy("d", "b")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    heads = two_level_rank(
        exact,
        [F.desc("exact_cnt"), F.col(key_col)],
        top,
        shard_col=h60(key),
    ).drop("rn")
    probes = heads.select(
        key_col,
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("x"),
    ).select(key_col, "exact_cnt", "x.d", "x.b")
    est = (
        probes.join(F.broadcast(counters), ["d", "b"])
        .groupBy(key_col, "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        key_col,
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt")).alias("overshoot"),
    )


def cms_counters_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-group counter table ``(g, d, b, cnt)`` — one independent CMS
    PER GROUP, all sharing the salted bucket hash (the
    ``hist_counters_fixed_grouped`` pattern at the frequency sketch).
    State is ``groups × depth × width`` rows, so it scales with the
    group cardinality — which is why, unlike the global form, nothing
    here forces a broadcast (the ``hist_quantiles_grouped`` lesson:
    AQE broadcasts small counter tables on its own; a forced hint
    would OOM on a high-cardinality group column)."""
    key = F.col(key_col).cast("string")
    df = df.where(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
    tall = df.select(
        F.col(group_col).alias("g"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("x"),
    ).select("g", "x.d", "x.b")
    return tall.groupBy("g", "d", "b").agg(F.count(F.lit(1)).alias("cnt"))


def cms_estimates_grouped(
    df: DataFrame,
    group_col: str,
    key_col: str,
    top: int = 5,
    depth: int = 4,
    width: int = 256,
) -> DataFrame:
    """Per-group CMS estimates for each group's ``top`` most frequent
    keys (exact count desc, key asc — deterministic cut per group).

    Every stage is keyed by the group: the head selection is a
    PARTITIONED window (no two-level dance needed — the group IS the
    shard), the counter join is on ``(g, d, b)``, and the min-over-
    depth agg is per ``(g, key)``.  No single-partition stage at any
    group cardinality, and no forced broadcast (see
    :func:`cms_counters_grouped`)."""
    key = F.col(key_col).cast("string")
    df = df.where(F.col(key_col).isNotNull() & F.col(group_col).isNotNull())
    exact = (
        df.select(F.col(group_col).alias("g"), F.col(key_col))
        .groupBy("g", key_col)
        .agg(F.count(F.lit(1)).alias("exact_cnt"))
    )
    # r12: counters derived from the exact (g, key) counts — the same
    # aggregate-before-shuffle rewrite as :func:`cms_estimates`; the
    # 4× explode runs over distinct (g, key) pairs, not input rows,
    # and the input is scanned once (reused exchange).  cnt(g, d, b) is
    # an integer sum of integer counts — bit-identical.
    counters = (
        exact.select(
            "g",
            "exact_cnt",
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(d).alias("d"),
                            cms_bucket(key, d, width).alias("b"),
                        )
                        for d in range(depth)
                    ]
                )
            ).alias("x"),
        )
        .select("g", "exact_cnt", "x.d", "x.b")
        .groupBy("g", "d", "b")
        .agg(F.sum("exact_cnt").alias("cnt"))
    )
    w = Window.partitionBy("g").orderBy(F.desc("exact_cnt"), F.col(key_col))
    heads = (
        exact.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= top)
        .drop("rn")
    )
    probes = heads.select(
        "g",
        key_col,
        "exact_cnt",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"),
                        cms_bucket(key, d, width).alias("b"),
                    )
                    for d in range(depth)
                ]
            )
        ).alias("x"),
    ).select("g", key_col, "exact_cnt", "x.d", "x.b")
    est = (
        probes.join(counters, ["g", "d", "b"])
        .groupBy("g", key_col, "exact_cnt")
        .agg(F.min("cnt").alias("cms_estimate"))
    )
    return est.select(
        F.col("g").alias(group_col),
        key_col,
        "exact_cnt",
        "cms_estimate",
        (F.col("cms_estimate") - F.col("exact_cnt")).alias("overshoot"),
    )


# ---------------------------------------------------------------------------
# Histogram quantiles


def hist_bucket_col(
    v: Column, mn: Column, mx: Column, buckets: int
) -> Column:
    """Equi-width bucket index of ``v`` over [mn, mx] → long in
    [0, buckets): the shared bucketing rule of :func:`hist_quantiles`
    (bounds discovered from the data) and the fixed-bound forms below
    (bounds pinned up front — the streaming contract).  Clamped at BOTH
    edges so out-of-range values (possible only under pinned bounds)
    land in the edge buckets instead of corrupting the table; span-0
    guard as in :func:`hist_quantiles`."""
    return (
        F.when(mx == mn, F.lit(0))
        .otherwise(
            F.greatest(
                F.lit(0),
                F.least(
                    F.lit(buckets - 1),
                    F.floor((v - mn) / (mx - mn) * F.lit(float(buckets))),
                ),
            )
        )
        .cast("long")
    )


def hist_counters_fixed(
    df: DataFrame,
    value_col: str,
    mn: float,
    mx: float,
    buckets: int = 256,
) -> DataFrame:
    """Fixed-bound histogram counter table ``(b, cnt)`` — the mergeable
    state a streaming maintainer (or per-shard pre-aggregation) holds.
    Bounds are pinned BY THE CALLER because a stream cannot know its
    global min/max up front: the standard fixed-bound histogram
    contract (values outside [mn, mx] clamp into the edge buckets, so
    the table never grows and merges stay cell-aligned).  Counters add
    elementwise across shards/micro-batches — same mergeability
    contract the Count-Min table proves cross-engine."""
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("v")
    )
    b = hist_bucket_col(
        F.col("v"), F.lit(float(mn)), F.lit(float(mx)), buckets
    )
    return vals.select(b.alias("b")).groupBy("b").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hist_counters_fixed_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    mn: float,
    mx: float,
    buckets: int = 256,
) -> DataFrame:
    """Per-group fixed-bound histogram counter table ``(g, b, cnt)`` —
    :func:`hist_counters_fixed` keyed by a group column (VERDICT r11
    #8: the grouped half of the streaming histogram maintainer).

    Bounds stay pinned GLOBALLY by the caller: a stream can no more
    know a group's min/max up front than the corpus's, and shared
    bounds are what keep cross-group cells comparable and merges
    cell-aligned on ``(g, b)``.  Out-of-range values clamp into the
    edge buckets exactly as in the global form.  State is
    ``groups × buckets`` rows, so the group column must be bounded by
    contract (a language / enum key — the
    :func:`hist_quantiles_grouped` docstring's cardinality rule);
    counters add elementwise per ``(g, b)`` across shards and
    micro-batches."""
    vals = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"),
        F.col(value_col).cast("double").alias("v"),
    )
    b = hist_bucket_col(
        F.col("v"), F.lit(float(mn)), F.lit(float(mx)), buckets
    )
    return vals.select("g", b.alias("b")).groupBy("g", "b").agg(
        F.count(F.lit(1)).alias("cnt")
    )


def hist_quantiles_grouped(
    df: DataFrame,
    group_col: str,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    buckets: int = 256,
    broadcast_bounds: bool = False,
) -> DataFrame:
    """Per-group histogram quantiles — :func:`hist_quantiles` with a
    group key, which changes the physical story in the way that matters
    at 100 TB: every window and agg below is PARTITIONED BY the group,
    so nothing in the plan is single-partition at any size (the global
    form's one bounded unpartitioned window disappears).  Bounds are
    discovered PER GROUP (each group gets its own [mn, mx] span, so a
    wide-range group cannot wash out a narrow one's resolution); the
    counter state is ``groups × buckets`` rows and still merges by
    cell-aligned addition within each group.

    The per-group bounds frame is one row PER GROUP — it scales with
    the group-key cardinality, not with a constant, so it is NOT force-
    broadcast by default (VERDICT r11 #1): a high-cardinality group
    (user id, domain) would build a driver-sized broadcast where a
    plain shuffle join on the group key is fine, and AQE already
    broadcasts genuinely small sides on its own.  Pass
    ``broadcast_bounds=True`` only when the caller can bound the group
    domain by contract (a language / country / enum column) — the same
    bounded-by-contract discipline the centroid broadcasts document.

    One row per (group, p): the same achieved-rank / bucket-share
    honesty contract as the global form."""
    vals = df.where(
        F.col(value_col).isNotNull() & F.col(group_col).isNotNull()
    ).select(
        F.col(group_col).alias("g"), F.col(value_col).cast("double").alias("v")
    )
    bounds = vals.groupBy("g").agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count("v").alias("n"),
    )
    bk = hist_bucket_col(F.col("v"), F.col("mn"), F.col("mx"), buckets)
    bounds_side = F.broadcast(bounds) if broadcast_bounds else bounds
    hist = (
        vals.join(bounds_side, "g")
        .select("g", bk.alias("b"), "mn", "mx", "n")
        .groupBy("g", "b", "mn", "mx", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = (
        Window.partitionBy("g")
        .orderBy("b")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).localCheckpoint(
        eager=False
    )
    pl = None
    for p in probs:
        row = cum.sparkSession.range(1).select(F.lit(float(p)).alias("p"))
        pl = row if pl is None else pl.unionByName(row)
    cand = pl.crossJoin(cum).where(
        F.col("cum") >= F.ceil(F.col("p") * F.col("n")).cast("long")
    )
    # rename the group key on the cuts side: cum and cuts share lineage,
    # so a cuts.g == cum.g condition resolves to the SAME attribute
    # (Spark warns "trivially true equals predicate") — distinct names
    # make the equi-join unambiguous
    cuts = (
        cand.groupBy("g", "p")
        .agg(F.min("b").alias("bucket"))
        .select(F.col("g").alias("cg"), "p", "bucket")
    )
    return (
        cuts.join(
            cum,
            (F.col("cg") == F.col("g")) & (F.col("bucket") == F.col("b")),
        )
        .select(
            F.col("cg").alias(group_col),
            "p",
            "n",
            "bucket",
            hround(
                F.col("mn")
                + (F.col("bucket") + 1)
                * (F.col("mx") - F.col("mn"))
                / F.lit(float(buckets)),
                6,
            ).alias("q_estimate"),
            F.col("cum").alias("rank_le"),
            hround(F.col("cum") / F.col("n"), 6).alias("rank_frac"),
            hround(F.col("cnt") / F.col("n"), 6).alias("bucket_share"),
        )
    )


def hist_quantiles(
    df: DataFrame,
    value_col: str,
    probs: tuple[float, ...] = (0.5, 0.9, 0.99),
    buckets: int = 256,
) -> DataFrame:
    """Quantile estimates from a fixed equi-width histogram — the
    deterministic mergeable quantile sketch (one row per requested
    probability).

    Why this exists next to the ``approx_percentile`` twins
    (``docs_quality_pct_approx`` / ``docs_perplexity_buckets_approx``):
    those are engine-native sketches checked behind a TOLERANCE
    contract; this one is checked BIT-EXACTLY, because every step is
    plain arithmetic both engines reproduce.  And it is the shape a
    100 TB percentile actually ships: exact order statistics need a
    global sort, while the histogram is two scans of distributed
    scalar work — (1) min/max/count, (2) one bounded groupBy into
    ``buckets`` counters.  The counter table is MERGEABLE by
    construction (counters add across shards/days — same contract the
    Count-Min table proves), so pre-aggregated per-partition
    histograms combine without re-touching rows.

    Estimator: for each p, the first bucket whose cumulative count
    reaches ``ceil(p·n)``; the estimate is that bucket's UPPER edge, so
    the reported ``rank_le`` (rows with bucket index ≤ the cut — i.e.
    rows ≤ the upper edge, by construction) always satisfies
    ``rank_le / n ≥ p``: one-sided, like CMS's never-under-counts.  The
    over-shoot is bounded by the cut bucket's own share, which the
    output exposes (``bucket_share``) instead of hiding — a skewed
    value distribution concentrates mass in few buckets and honesty
    requires reporting the achieved rank, not pretending p was hit.

    The cumulative pass is an unpartitioned running sum over the
    counter table — bounded at ``buckets`` rows by construction
    (same documented exemption as the CMS counter table; the data-sized
    stages are the two scans).  Null values are dropped (rank semantics
    over nulls differ cross-engine)."""
    vals = df.where(F.col(value_col).isNotNull()).select(
        F.col(value_col).cast("double").alias("v")
    )
    bounds = vals.agg(
        F.min("v").alias("mn"),
        F.max("v").alias("mx"),
        F.count("v").alias("n"),
    )
    # shared bucketing rule (the low clamp is a no-op here — bounds come
    # from the data, so every value is in range; span-0 guard included)
    bk = hist_bucket_col(
        F.col("v"), F.col("mn"), F.col("mx"), buckets
    )
    hist = (
        vals.crossJoin(F.broadcast(bounds))
        .select(bk.alias("b"), "mn", "mx", "n")
        .groupBy("b", "mn", "mx", "n")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, 0)
    # one lazy checkpoint: the ≤buckets-row cumulative table fans out to
    # every probability's cut — without it each p re-runs the full scan
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).localCheckpoint(
        eager=False
    )
    pl = None
    for p in probs:
        row = cum.sparkSession.range(1).select(F.lit(float(p)).alias("p"))
        pl = row if pl is None else pl.unionByName(row)
    cand = pl.join(
        F.broadcast(cum),
        F.col("cum") >= F.ceil(F.col("p") * F.col("n")).cast("long"),
    )
    cuts = cand.groupBy("p").agg(F.min("b").alias("bucket"))
    return (
        cuts.join(
            F.broadcast(cum), F.col("bucket") == F.col("b")
        ).select(
            "p",
            "n",
            "bucket",
            hround(
                F.col("mn")
                + (F.col("bucket") + 1)
                * (F.col("mx") - F.col("mn"))
                / F.lit(float(buckets)),
                6,
            ).alias("q_estimate"),
            F.col("cum").alias("rank_le"),
            hround(F.col("cum") / F.col("n"), 6).alias("rank_frac"),
            hround(F.col("cnt") / F.col("n"), 6).alias("bucket_share"),
        )
    )


# ---------------------------------------------------------------------------
# Bloom filter (Bloom 1970) — the membership sketch


# 62 usable bits per word, not 64: DuckDB's ``<<`` overflow-checks
# ``1::BIGINT << 63`` (and bit 62 is the sign-adjacent maximum that
# keeps every word positive in BOTH engines), so positions map to
# (word_idx = pos // 62, bit = pos % 62).  Spark's shiftleft would
# happily wrap — the narrower width is the cross-engine contract.
BLOOM_BITS_PER_WORD = 62
BLOOM_WORDS = 128
BLOOM_HASHES = 4


# Kirsch-Mitzenmacher double hashing (2006): derive all n positions
# from TWO base hashes, pos_i = (h1 + i·h2) mod m — asymptotically the
# same false-positive rate as n independent hashes, at HALF the md5
# cost per probed row (the ladder measured the probe md5-bound: this
# is the 100 TB hot path's per-row constant).  Overflow-safe by
# construction: h1, h2 < 2^60 and i ≤ n_hashes−1, so h1 + i·h2 < 2^63
# for any n_hashes ≤ 8 — exact signed-64 arithmetic in both engines.


def bloom_base_hashes(key: Column) -> tuple[Column, Column]:
    """The two md5-derived base hashes ("b0:"/"b1:" salts, same
    construction as :func:`cms_bucket`) every bit position derives
    from."""
    return (
        h60(F.concat(F.lit("b0:"), key.cast("string"))),
        h60(F.concat(F.lit("b1:"), key.cast("string"))),
    )


def bloom_pos(h1: Column, h2: Column, hash_idx: int, m_bits: int) -> Column:
    """Bit position ``(h1 + i·h2) mod m`` of hash ``hash_idx``."""
    return (h1 + F.lit(hash_idx) * h2) % F.lit(m_bits)


def bloom_base_hashes_sql(key_expr: str) -> tuple[str, str]:
    s = f"CAST({key_expr} AS VARCHAR)"
    return (
        H60_SQL.format(s=f"'b0:' || {s}"),
        H60_SQL.format(s=f"'b1:' || {s}"),
    )


def bloom_pos_sql(h1_expr: str, h2_expr: str, hash_idx_expr: str, m_bits: int) -> str:
    return f"(({h1_expr} + {hash_idx_expr} * {h2_expr}) % {m_bits})"


def _bloom_positions(
    df: DataFrame, key_col: str, words: int, n_hashes: int
) -> DataFrame:
    """One row per (input row, hash index) with the bit ``pos``.
    ``inline`` of a literal array keeps the fan-out JVM-side."""
    m_bits = words * BLOOM_BITS_PER_WORD
    h1, h2 = bloom_base_hashes(F.col(key_col))
    return (
        df.where(F.col(key_col).isNotNull())
        .withColumn("_h1", h1)
        .withColumn("_h2", h2)
        .select(
            *df.columns,
            F.explode(
                F.array(
                    *[
                        bloom_pos(F.col("_h1"), F.col("_h2"), i, m_bits)
                        for i in range(n_hashes)
                    ]
                )
            ).alias("pos"),
        )
    )


def bloom_words(
    df: DataFrame,
    key_col: str,
    words: int = BLOOM_WORDS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Build the filter as a DENSE ``(word_idx, word)`` table —
    ``words`` rows of 62-bit-packed BIGINTs (absent words 0-filled via
    a range join so the state shape is constant regardless of data).

    The aggregation is ``bit_or`` — associative, commutative,
    idempotent — so per-shard filters merge by elementwise OR
    (:func:`bloom_words_sharded` proves it against the single-pass
    form, and the streaming maintainer replays the same merge over
    micro-batches).  State is ``words`` longs TOTAL: at 100 TB the
    build side streams through a partial ``bit_or`` per partition and
    the driver-visible result never exceeds the fixed word count —
    this is Spark's own runtime-filter shape (InjectRuntimeFilter's
    bloom pruning), reproduced here as an explicit, mergeable,
    cross-engine-checkable artifact a pipeline can persist and reuse.
    """
    b = F.lit(BLOOM_BITS_PER_WORD)
    packed = (
        _bloom_positions(df, key_col, words, n_hashes)
        .select(
            F.floor(F.col("pos") / b).cast("long").alias("word_idx"),
            (F.col("pos") % b).cast("int").alias("bit"),
        )
        .select("word_idx", F.expr("shiftleft(1L, bit)").alias("bitval"))
        .groupBy("word_idx")
        .agg(F.bit_or("bitval").alias("word"))
    )
    dense = df.sparkSession.range(words).select(F.col("id").alias("word_idx"))
    return (
        dense.join(packed, "word_idx", "left")
        .select(
            "word_idx",
            F.coalesce("word", F.lit(0).cast("long")).alias("word"),
        )
    )


def bloom_words_sharded(
    df: DataFrame,
    key_col: str,
    shard_col: Column,
    words: int = BLOOM_WORDS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Shard-then-merge build: per-shard word tables OR-merged — the
    partial-aggregate shape a 1000-executor run uses.  Equality with
    :func:`bloom_words` is proven (a) in tests against a direct Python
    md5 model and (b) cross-engine by ``sketch_bloom_merge``'s
    single-pass oracle."""
    b = F.lit(BLOOM_BITS_PER_WORD)
    per_shard = (
        _bloom_positions(
            df.withColumn("_shard", shard_col), key_col, words, n_hashes
        )
        .select(
            "_shard",
            F.floor(F.col("pos") / b).cast("long").alias("word_idx"),
            (F.col("pos") % b).cast("int").alias("bit"),
        )
        .select("_shard", "word_idx", F.expr("shiftleft(1L, bit)").alias("bitval"))
        .groupBy("_shard", "word_idx")
        .agg(F.bit_or("bitval").alias("word"))
    )
    merged = per_shard.groupBy("word_idx").agg(F.bit_or("word").alias("word"))
    dense = df.sparkSession.range(words).select(F.col("id").alias("word_idx"))
    return dense.join(merged, "word_idx", "left").select(
        "word_idx", F.coalesce("word", F.lit(0).cast("long")).alias("word")
    )


def bloom_probe(
    df: DataFrame,
    key_col: str,
    words_df: DataFrame,
    words: int = BLOOM_WORDS,
    n_hashes: int = BLOOM_HASHES,
) -> DataFrame:
    """Membership test: every input row back, plus ``is_candidate``
    true iff all ``n_hashes`` bits for ``key_col`` are set (NULL keys
    test false — a NULL is never a member).

    Shape matters more than the arithmetic here: the probe side is the
    100 TB side, so it must NEVER shuffle.  Each hash is one chained
    LEFT BROADCAST join against ``words_df`` — which is broadcast by
    CONSTRUCTION bound, not by data: the dense ``words``-row table
    :func:`bloom_words` emits (128 rows × 16 bytes by default), so the
    hint can never scale with a key or group cardinality (the
    ``hist_quantiles_grouped`` broadcast rule).  The executed plan is
    ``n_hashes`` map-side BroadcastHashJoins over a single scan of the
    probe — no exchange, no explode, no per-key aggregation
    (plan-asserted in tests/test_plans.py).  No false negatives ever:
    a build key's bits are all set by definition; false positives are
    quantified by the caller against an exact anti-join, which is what
    ``sketch_bloom_semijoin`` reports per segment."""
    key = F.col(key_col)
    b = F.lit(BLOOM_BITS_PER_WORD)
    m_bits = words * BLOOM_BITS_PER_WORD
    in_cols = list(df.columns)
    out = df
    h1, h2 = bloom_base_hashes(key)
    out = out.withColumn("_h1", h1).withColumn("_h2", h2)
    hits = []
    for i in range(n_hashes):
        pos = bloom_pos(F.col("_h1"), F.col("_h2"), i, m_bits)
        wdf = words_df.select(
            F.col("word_idx").alias(f"_wi{i}"), F.col("word").alias(f"_w{i}")
        )
        out = (
            out.withColumn(f"_wi{i}", F.floor(pos / b).cast("long"))
            .withColumn(f"_bit{i}", (pos % b).cast("int"))
            .join(F.broadcast(wdf), f"_wi{i}", "left")
        )
        hits.append(
            F.coalesce(
                F.col(f"_w{i}").bitwiseAND(
                    F.expr(f"shiftleft(1L, _bit{i})")
                )
                != 0,
                F.lit(False),
            )
        )
    cand = hits[0]
    for h in hits[1:]:
        cand = cand & h
    return out.select(*in_cols, cand.alias("is_candidate"))
