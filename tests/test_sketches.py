"""Unit tests for the deterministic mergeable-sketch operators
(operators/sketches.py).

The driver-level cross-engine checks live in plans/sketch_queries.py;
here we pin the sketch-theoretic invariants that the oracle equality
alone would not distinguish from luck:

- KMV merge ≡ single-pass on the SAME engine, for several shard counts
  (the associativity that makes the sketch a partial aggregate);
- KMV estimates actually estimate (bounded relative error at k = 64 on
  a known-cardinality domain, and exact below the sketch size);
- CMS never under-counts, and collisions genuinely occur at the
  registered width (otherwise the overshoot column is vacuously 0);
- the Jaccard estimator is exact when the union fits in the sketch and
  within the KMV error envelope when it does not.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.operators import sketches


def _keys(spark, n, group="g"):
    return spark.range(n).select(
        F.lit(group).alias("grp"), F.col("id").alias("key")
    )


class TestKMV:
    def test_exact_below_k(self, spark):
        """Domains smaller than k are reported exactly (the estimator's
        n_vals < k branch)."""
        df = _keys(spark, 40)
        out = sketches.kmv_group_estimates(df, "grp", "key", k=64).collect()[0]
        assert out["n_exact"] == 40
        assert out["kmv_estimate"] == 40.0
        assert out["rel_err"] == 0.0

    def test_relative_error_bounded(self, spark):
        """At k = 64 the standard error is ~1/sqrt(k-2) ≈ 12.7%; 50%
        is a generous 4-sigma bound — a hashing or ranking bug lands
        orders of magnitude off, not within it."""
        df = _keys(spark, 10_000)
        out = sketches.kmv_group_estimates(df, "grp", "key", k=64).collect()[0]
        assert out["n_exact"] == 10_000
        assert abs(out["kmv_estimate"] - 10_000) / 10_000 < 0.5

    def test_duplicates_do_not_inflate(self, spark):
        """KMV sketches the DISTINCT key set: replicating every key 7x
        must not move the estimate at all."""
        df = _keys(spark, 5_000)
        dup = df.crossJoin(spark.range(7).select(F.lit(1).alias("x"))).drop("x")
        a = sketches.kmv_group_estimates(df, "grp", "key", k=64).collect()[0]
        b = sketches.kmv_group_estimates(dup, "grp", "key", k=64).collect()[0]
        assert a["kmv_estimate"] == b["kmv_estimate"]
        assert a["n_exact"] == b["n_exact"]

    @pytest.mark.parametrize("n_shards", [2, 4, 7])
    def test_merge_equals_single_pass(self, spark, n_shards):
        """The mergeability proof on one engine, shard-count invariant:
        union-of-shard-top-ks re-topped == single-pass top-k, value for
        value (not just the estimate)."""
        df = _keys(spark, 3_000)
        single = sketches.kmv_sketch(df, "grp", "key", k=64)
        merged = sketches.kmv_merge_sketch(
            df, "grp", "key", shard_col=F.pmod(F.col("key"), F.lit(n_shards)), k=64
        )
        a = sorted(r["h"] for r in single.collect())
        b = sorted(r["h"] for r in merged.collect())
        assert a == b

    def test_merge_below_k_is_exact_union(self, spark):
        """When the global domain never fills the sketch, the merged
        union must carry ALL hashes (estimate falls back to exact)."""
        df = _keys(spark, 50)
        merged = sketches.kmv_merge_sketch(
            df, "grp", "key", shard_col=F.pmod(F.col("key"), F.lit(4)), k=64
        )
        assert merged.count() == 50


class TestKMVJaccard:
    def test_exact_when_union_fits(self, spark):
        """Union of 30 keys < k = 64: the sketch IS the union, so the
        estimate equals the exact Jaccard."""
        left = spark.range(0, 20).select(F.col("id").alias("key"))
        right = spark.range(10, 30).select(F.col("id").alias("key"))
        out = sketches.kmv_jaccard(left, right, "key", k=64).collect()[0]
        assert out["jaccard_exact"] == out["jaccard_kmv"]
        assert out["n_a"] == 20 and out["n_b"] == 20
        assert out["jaccard_exact"] == round(10 / 30, 6)

    def test_estimate_within_envelope(self, spark):
        """2000 ∪ 2000 with 1000 shared (J = 1/3): the k = 64 estimate
        is binomial with sd ≈ sqrt(J(1-J)/k) ≈ 0.059 — assert a 4-sigma
        envelope."""
        left = spark.range(0, 2_000).select(F.col("id").alias("key"))
        right = spark.range(1_000, 3_000).select(F.col("id").alias("key"))
        out = sketches.kmv_jaccard(left, right, "key", k=64).collect()[0]
        assert out["jaccard_exact"] == round(1_000 / 3_000, 6)
        assert abs(out["jaccard_kmv"] - 1 / 3) < 0.25


class TestKMVSetOps:
    def test_exact_when_union_fits(self, spark):
        """Union of 30 keys < k = 64: every region estimate degrades to
        the exact cardinality (the sketch IS the union)."""
        left = spark.range(0, 20).select(F.col("id").alias("key"))
        right = spark.range(10, 30).select(F.col("id").alias("key"))
        out = sketches.kmv_setops(left, right, "key", k=64).collect()[0]
        assert out["n_union"] == 30 and out["n_inter"] == 10
        assert out["union_kmv"] == 30.0
        assert out["inter_kmv"] == 10.0
        assert out["aonly_kmv"] == 10.0
        assert out["bonly_kmv"] == 10.0

    def test_empty_inputs_report_zero_regions(self, spark):
        """Both sides empty (ADVICE r11 #1): n_vals = 0 makes the
        region share 0/0 — the guard must report 0.0 for every region
        (the regions of an empty union ARE empty), never NULL."""
        from pyspark.sql import types as T

        empty = spark.createDataFrame(
            [], T.StructType([T.StructField("key", T.LongType())])
        )
        out = sketches.kmv_setops(empty, empty, "key", k=64).collect()[0]
        assert out["n_union"] == 0 and out["n_inter"] == 0
        assert out["union_kmv"] == 0.0
        assert out["inter_kmv"] == 0.0
        assert out["aonly_kmv"] == 0.0
        assert out["bonly_kmv"] == 0.0

    def test_regions_partition_the_union_estimate(self, spark):
        """inter + aonly + bonly must reassemble union_kmv exactly (up
        to the per-region rounding): the three region counts partition
        the sketch, so their share-weighted estimates partition the
        union estimate — an algebraic invariant, not a statistical one."""
        left = spark.range(0, 2_000).select(F.col("id").alias("key"))
        right = spark.range(1_000, 3_000).select(F.col("id").alias("key"))
        out = sketches.kmv_setops(left, right, "key", k=64).collect()[0]
        total = out["inter_kmv"] + out["aonly_kmv"] + out["bonly_kmv"]
        assert abs(total - out["union_kmv"]) < 2e-4 * 3  # 3 roundings at 4dp

    def test_estimates_within_envelope(self, spark):
        """2000 ∪ 2000 with 1000 shared: union estimate within the KMV
        k = 64 envelope, and each region's share estimate within a
        4-sigma binomial envelope of its true share."""
        left = spark.range(0, 2_000).select(F.col("id").alias("key"))
        right = spark.range(1_000, 3_000).select(F.col("id").alias("key"))
        out = sketches.kmv_setops(left, right, "key", k=64).collect()[0]
        assert out["n_union"] == 3_000 and out["n_inter"] == 1_000
        assert abs(out["union_kmv"] - 3_000) / 3_000 < 0.5  # ~1/sqrt(63) 4σ
        for col, truth in (
            ("inter_kmv", 1_000),
            ("aonly_kmv", 1_000),
            ("bonly_kmv", 1_000),
        ):
            # share error ≤ 4·sqrt(p(1-p)/k) ≈ 0.24, scaled by union est
            assert abs(out[col] / out["union_kmv"] - truth / 3_000) < 0.25


class TestHistQuantiles:
    def test_rank_is_one_sided_and_granularity_bounded(self, spark):
        """The CMS-style one-sided contract: the achieved rank is never
        below p, and the overshoot is bounded by the cut bucket's own
        share (the honesty column the output exposes)."""
        df = spark.range(10_000).select(
            ((F.col("id") * 7919) % 100_000).cast("double").alias("x")
        )
        rows = sketches.hist_quantiles(df, "x").collect()
        assert len(rows) == 3
        for r in rows:
            assert r["rank_frac"] >= r["p"]
            assert r["rank_frac"] - r["p"] <= r["bucket_share"] + 1e-9

    def test_estimates_differ_and_are_ordered(self, spark):
        """p50 < p90 < p99 on a spread-out domain — the degenerate-
        output eyeball as a unit invariant."""
        df = spark.range(5_000).select(
            (F.col("id") % 977).cast("double").alias("x")
        )
        rows = {
            r["p"]: r["q_estimate"]
            for r in sketches.hist_quantiles(df, "x").collect()
        }
        assert rows[0.5] < rows[0.9] < rows[0.99]

    def test_constant_column_span_guard(self, spark):
        """All-equal values: the span-0 guard buckets everything at 0
        and every estimate is the constant itself at rank 1.0."""
        df = spark.range(100).select(F.lit(42.5).alias("x"))
        rows = sketches.hist_quantiles(df, "x").collect()
        for r in rows:
            assert r["bucket"] == 0
            assert r["q_estimate"] == 42.5
            assert r["rank_frac"] == 1.0

    def test_fine_buckets_approach_exact(self, spark):
        """With more buckets than distinct values, every value gets its
        own bucket and the achieved rank is the exact ceil(p*n) order
        statistic's rank (granularity error vanishes)."""
        df = spark.range(1_000).select(F.col("id").cast("double").alias("x"))
        rows = sketches.hist_quantiles(df, "x", buckets=4096).collect()
        import math

        for r in rows:
            assert r["rank_le"] == math.ceil(r["p"] * 1_000)


class TestHistQuantilesGrouped:
    def _df(self, spark):
        from pyspark.sql import functions as F

        # two groups with deliberately different spreads: g0 ~ [0,100),
        # g1 ~ [0,1000) — per-group bounds must keep g0's resolution
        return spark.range(2_000).select(
            F.concat(F.lit("g"), (F.col("id") % 2)).alias("grp"),
            (
                (F.col("id") % 100).cast("double")
                * F.when(F.col("id") % 2 == 1, 10.0).otherwise(1.0)
            ).alias("x"),
        )

    def test_matches_global_form_per_group(self, spark):
        """Each group's rows through the GLOBAL operator must equal that
        group's rows from the grouped operator — same rule, same
        estimates (per-group bounds make this exact, not approximate)."""
        from pyspark.sql import functions as F

        df = self._df(spark)
        grouped = {
            (r["grp"], r["p"]): (r["q_estimate"], r["rank_le"])
            for r in sketches.hist_quantiles_grouped(df, "grp", "x").collect()
        }
        for g in ("g0", "g1"):
            solo = sketches.hist_quantiles(
                df.where(F.col("grp") == g), "x"
            ).collect()
            for r in solo:
                assert grouped[(g, r["p"])] == (r["q_estimate"], r["rank_le"])

    def test_per_group_bounds_preserve_resolution(self, spark):
        """g0's p50 must land near 50, not be washed to g1's scale —
        the per-group-bounds rationale as an assertion."""
        rows = {
            (r["grp"], r["p"]): r["q_estimate"]
            for r in sketches.hist_quantiles_grouped(
                self._df(spark), "grp", "x"
            ).collect()
        }
        assert abs(rows[("g0", 0.5)] - 50) < 2  # bucket width ~0.39
        assert abs(rows[("g1", 0.5)] - 500) < 20

    def test_no_single_partition_stage(self, spark):
        """The grouped form's selling point, plan-tested: the executed
        plan contains NO SinglePartition exchange anywhere (the global
        form's one bounded unpartitioned window disappears when every
        window/agg is keyed by the group)."""
        df = sketches.hist_quantiles_grouped(self._df(spark), "grp", "x")
        df.collect()  # finalize AQE
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "SinglePartition" not in plan


class TestPrioritySample:
    def test_exact_when_input_fits(self, spark):
        """≤ k rows: tau = 0, every row keeps its own weight, and the
        estimate IS the exact total — the KMV-style degrade-to-exact
        regime."""
        df = spark.range(1, 41).select(
            F.col("id").alias("key"), (F.col("id") * 10.0).alias("w")
        )
        out = sketches.priority_sample_summary(df, "key", "w", k=64).collect()[0]
        assert out["n_rows"] == 40 and out["n_sample"] == 40
        assert out["tau"] == 0.0
        assert out["w_total_estimate"] == out["w_total_exact"] == 8200.0
        assert out["rel_err"] == 0.0

    def test_estimate_within_envelope(self, spark):
        """10k uniform-ish weights sampled at k = 64: the DLT estimator
        must land within a loose 4-sigma envelope (~4/sqrt(k-1) ≈ 0.5
        relative) of the true total — the property, not the instance,
        so a sign error or a tau-off-by-one fails this immediately."""
        df = spark.range(1, 10_001).select(
            F.col("id").alias("key"),
            ((F.col("id") % 997) + 1).cast("double").alias("w"),
        )
        out = sketches.priority_sample_summary(df, "key", "w", k=64).collect()[0]
        assert out["n_rows"] == 10_000 and out["n_sample"] == 64
        assert out["tau"] > 0
        assert out["rel_err"] < 0.5
        # consistency: the reported rel_err is derived from the two
        # reported totals, so the honesty column can't drift from them
        want = abs(out["w_total_estimate"] - out["w_total_exact"]) / out[
            "w_total_exact"
        ]
        assert abs(out["rel_err"] - want) < 1e-4

    def test_heavy_rows_kept_exactly(self, spark):
        """A single dominant weight (1e9 among ~5k-scale noise) must be
        in the sample with its OWN weight (w >= tau counts it in
        n_heavy), so the estimate tracks totals a uniform sample would
        miss — the reason weighted sampling exists."""
        from pyspark.sql import functions as F2

        df = spark.range(1, 5_001).select(
            F.col("id").alias("key"),
            F2.when(F.col("id") == 777, 1e9)
            .otherwise((F.col("id") % 100) + 1.0)
            .alias("w"),
        )
        out = sketches.priority_sample_summary(df, "key", "w", k=64).collect()[0]
        assert out["n_heavy"] >= 1
        # the dominant weight is ~1e9 of a ~1.00025e9 total: the
        # estimate must carry it (a miss would undershoot by ~99.97%)
        assert out["w_total_estimate"] >= 1e9

    def test_deterministic(self, spark):
        df = spark.range(1, 2_001).select(
            F.col("id").alias("key"), (F.col("id") % 37 + 1.0).alias("w")
        )
        a = sketches.priority_sample_summary(df, "key", "w").collect()
        b = sketches.priority_sample_summary(df, "key", "w").collect()
        assert a == b


class TestCMS:
    def test_never_undercounts(self, spark):
        """The CMS invariant: estimate ≥ exact for every probed key."""
        df = spark.range(20_000).select((F.col("id") % 500).alias("key"))
        out = sketches.cms_estimates(df, "key", top=50, depth=4, width=64)
        rows = out.collect()
        assert len(rows) == 50
        assert all(r["overshoot"] >= 0 for r in rows)

    def test_collisions_bind_at_registered_width(self, spark):
        """At width 64 with 500 keys every counter row holds ~8 keys, so
        at least one probed key must collide (overshoot > 0) — guards
        the registered query against a vacuously-exact configuration."""
        df = spark.range(20_000).select((F.col("id") % 500).alias("key"))
        rows = sketches.cms_estimates(df, "key", top=50, depth=4, width=64).collect()
        assert any(r["overshoot"] > 0 for r in rows)

    def test_exact_when_wide(self, spark):
        """Width far above the key count ⇒ no collisions ⇒ estimates
        exactly equal the counts (the degenerate-correct corner)."""
        df = spark.range(1_000).select((F.col("id") % 10).alias("key"))
        rows = sketches.cms_estimates(df, "key", top=10, depth=4, width=4096).collect()
        assert all(r["overshoot"] == 0 for r in rows)
        assert all(r["exact_cnt"] == 100 for r in rows)

    def test_counter_table_is_bounded(self, spark):
        """The counter side of the estimate join is at most depth×width
        rows no matter the input size — the broadcastability contract."""
        df = spark.range(50_000).select((F.col("id") % 3_000).alias("key"))
        n = sketches.cms_counters(df, "key", depth=4, width=64).count()
        assert n <= 4 * 64


class TestBloom:
    """Bloom filter invariants the oracle equality alone would not
    distinguish from luck: agreement with a DIRECT Python md5 model
    (the hashing itself, not just engine-vs-engine), merge ≡
    single-pass across shard counts, the no-false-negatives guarantee,
    and the constant dense state shape."""

    W, H = 16, 4

    def _build(self, spark, keys):
        return spark.createDataFrame([(k,) for k in keys], "key bigint")

    def _python_model(self, keys):
        import hashlib

        b = sketches.BLOOM_BITS_PER_WORD
        m_bits = self.W * b
        words = [0] * self.W
        for k in keys:
            h1 = int(hashlib.md5(f"b0:{k}".encode()).hexdigest()[:15], 16)
            h2 = int(hashlib.md5(f"b1:{k}".encode()).hexdigest()[:15], 16)
            for i in range(self.H):
                pos = (h1 + i * h2) % m_bits
                words[pos // b] |= 1 << (pos % b)
        return words

    def test_matches_direct_python_md5_model(self, spark):
        """Every word equals a from-scratch Python construction — pins
        the salt format, the 60-bit truncation, the 62-bit packing and
        the word split, independent of any SQL engine."""
        keys = list(range(100, 160))
        got = {
            r["word_idx"]: r["word"]
            for r in sketches.bloom_words(
                self._build(spark, keys), "key", self.W, self.H
            ).collect()
        }
        model = self._python_model(keys)
        assert got == {i: model[i] for i in range(self.W)}

    @pytest.mark.parametrize("shards", [2, 5])
    def test_sharded_merge_equals_single_pass(self, spark, shards):
        """bit_or associativity/commutativity as an executed fact, for
        shard fan-outs that do and do not divide the key count."""
        df = self._build(spark, list(range(300)))
        single = {
            r["word_idx"]: r["word"]
            for r in sketches.bloom_words(df, "key", self.W, self.H).collect()
        }
        merged = {
            r["word_idx"]: r["word"]
            for r in sketches.bloom_words_sharded(
                df, "key", F.col("key") % shards, self.W, self.H
            ).collect()
        }
        assert merged == single

    def test_no_false_negatives_and_null_keys_probe_false(self, spark):
        """A build key can never test negative (its bits are set by
        definition); a NULL probe key is never a member."""
        keys = list(range(50))
        words = sketches.bloom_words(
            self._build(spark, keys), "key", self.W, self.H
        ).localCheckpoint(eager=True)
        probe = spark.createDataFrame(
            [(k,) for k in keys] + [(None,)], "key bigint"
        )
        got = {
            r["key"]: r["is_candidate"]
            for r in sketches.bloom_probe(
                probe, "key", words, self.W, self.H
            ).collect()
        }
        assert all(got[k] for k in keys)
        assert got[None] is False

    def test_sized_filter_rejects_most_nonmembers(self, spark):
        """At load ≈ 0.08 (50 keys × 4 hashes / 256×62 bits) the
        theoretical fp rate is ~4e-5 — so of 1000 non-members,
        essentially none may pass.  Guards against a degenerate
        always-true probe (which would also satisfy the
        no-false-negatives test)."""
        keys = list(range(50))
        words = sketches.bloom_words(
            self._build(spark, keys), "key", 256, self.H
        ).localCheckpoint(eager=True)
        probe = self._build(spark, list(range(1000, 2000)))
        n_pass = (
            sketches.bloom_probe(probe, "key", words, 256, self.H)
            .where("is_candidate")
            .count()
        )
        assert n_pass <= 5

    def test_dense_state_shape_is_constant(self, spark):
        """One key or a thousand: the emitted table is always exactly
        ``words`` rows with every index present (0-filled) — the
        broadcastability / mergeability contract."""
        for n in (1, 1000):
            out = sketches.bloom_words(
                self._build(spark, list(range(n))), "key", self.W, self.H
            ).collect()
            assert len(out) == self.W
            assert sorted(r["word_idx"] for r in out) == list(range(self.W))

    def test_probe_preserves_input_rows_and_columns(self, spark):
        """The probe is a row-for-row annotator (map-side contract):
        duplicate input keys stay duplicated, extra columns ride
        through untouched."""
        words = sketches.bloom_words(
            self._build(spark, [1, 2, 3]), "key", self.W, self.H
        )
        probe = spark.createDataFrame(
            [(1, "a"), (1, "b"), (9, "c")], "key bigint, tag string"
        )
        rows = sketches.bloom_probe(probe, "key", words, self.W, self.H).collect()
        assert len(rows) == 3
        assert sorted(r["tag"] for r in rows) == ["a", "b", "c"]
        assert all(set(r.asDict()) == {"key", "tag", "is_candidate"} for r in rows)


class TestCMSGrouped:
    """Per-group CMS (round 12): the invariants the registered query's
    oracle match alone can't distinguish from luck — never-undercounts
    PER GROUP, group isolation (a group's counters are untouched by
    another group's mass), and exactness when wide."""

    def _two_group(self, spark):
        # g0: 500 hot keys over 10k rows; g1: DIFFERENT key range,
        # 10× lighter — cross-group contamination would inflate g1
        a = spark.range(10_000).select(
            F.lit("g0").alias("grp"), (F.col("id") % 500).alias("key")
        )
        b = spark.range(1_000).select(
            F.lit("g1").alias("grp"), (F.col("id") % 50 + 10_000).alias("key")
        )
        return a.unionByName(b)

    def test_never_undercounts_per_group(self, spark):
        rows = sketches.cms_estimates_grouped(
            self._two_group(spark), "grp", "key", top=10, depth=4, width=64
        ).collect()
        assert {r["grp"] for r in rows} == {"g0", "g1"}
        assert all(r["overshoot"] >= 0 for r in rows)

    def test_group_isolation(self, spark):
        """g1's estimates must equal a run over g1's rows ALONE: the
        (g, d, b) counter key means g0's 10× mass cannot leak into
        g1's counters (the property a global-counter implementation
        would violate)."""
        both = sketches.cms_estimates_grouped(
            self._two_group(spark), "grp", "key", top=10, depth=4, width=64
        )
        g1_both = {
            (r["key"]): (r["exact_cnt"], r["cms_estimate"])
            for r in both.where("grp = 'g1'").collect()
        }
        alone = sketches.cms_estimates_grouped(
            self._two_group(spark).where("grp = 'g1'"),
            "grp",
            "key",
            top=10,
            depth=4,
            width=64,
        )
        g1_alone = {
            (r["key"]): (r["exact_cnt"], r["cms_estimate"])
            for r in alone.collect()
        }
        assert g1_both == g1_alone

    def test_exact_when_wide(self, spark):
        rows = sketches.cms_estimates_grouped(
            self._two_group(spark), "grp", "key", top=10, depth=4, width=4096
        ).collect()
        assert all(r["overshoot"] == 0 for r in rows)

    def test_counter_state_scales_with_groups_only(self, spark):
        """≤ groups × depth × width rows no matter the input size —
        and therefore NOT broadcastable by contract (the operator
        forces no hint; this pins the state-shape half of that
        docstring claim)."""
        n = sketches.cms_counters_grouped(
            self._two_group(spark), "grp", "key", depth=4, width=64
        ).count()
        assert n <= 2 * 4 * 64


class TestPrioritySampleGrouped:
    """Stratified priority sampling (round 12): per-group DLT
    invariants — heavy-hitter retention lands in the RIGHT group,
    degrade-to-exact per group, and group isolation of tau."""

    def _mixed(self, spark):
        # g0: 2000 noise rows (w ∈ [1, 100]) + one planted 1e9 whale;
        # g1: 10 rows (below k — must degrade to exact)
        noise = spark.range(2_000).select(
            F.lit("g0").alias("grp"),
            F.col("id").alias("key"),
            ((F.col("id") % 100) + 1).cast("double").alias("w"),
        )
        whale = spark.range(1).select(
            F.lit("g0").alias("grp"),
            F.lit(999_999).alias("key"),
            F.lit(1e9).alias("w"),
        )
        small = spark.range(10).select(
            F.lit("g1").alias("grp"),
            (F.col("id") + 10_000).alias("key"),
            F.lit(5.0).alias("w"),
        )
        return noise.unionByName(whale).unionByName(small)

    def test_whale_retained_in_its_group_only(self, spark):
        rows = {
            r["grp"]: r
            for r in sketches.priority_sample_summary_grouped(
                self._mixed(spark), "grp", "key", "w", k=16
            ).collect()
        }
        g0 = rows["g0"]
        # the 1e9 weight must be carried by the estimator (w_est ≥ 1e9)
        # and counted as a heavy row in g0
        assert g0["n_heavy"] >= 1
        assert g0["w_total_estimate"] >= 1e9
        assert rows["g1"]["n_heavy"] == 0 or rows["g1"]["tau"] == 0.0

    def test_small_group_degrades_to_exact(self, spark):
        rows = {
            r["grp"]: r
            for r in sketches.priority_sample_summary_grouped(
                self._mixed(spark), "grp", "key", "w", k=16
            ).collect()
        }
        g1 = rows["g1"]
        assert g1["n_rows"] == 10 and g1["n_sample"] == 10
        assert g1["tau"] == 0.0
        assert g1["w_total_estimate"] == g1["w_total_exact"] == 50.0
        assert g1["rel_err"] == 0.0

    def test_group_isolation(self, spark):
        """g1's summary must equal a run over g1 alone — g0's whale
        cannot move g1's tau or estimate (per-group state, the
        cms_estimates_grouped isolation property)."""
        both = {
            r["grp"]: r.asDict()
            for r in sketches.priority_sample_summary_grouped(
                self._mixed(spark), "grp", "key", "w", k=16
            ).collect()
        }
        alone = {
            r["grp"]: r.asDict()
            for r in sketches.priority_sample_summary_grouped(
                self._mixed(spark).where("grp = 'g1'"), "grp", "key", "w", k=16
            ).collect()
        }
        assert both["g1"] == alone["g1"]

    def test_matches_global_when_one_group(self, spark):
        """On a single-group frame the stratified form must reproduce
        the global operator row for row (same estimator assembly,
        different physical shape — two_level_rank vs partitioned
        window — so equality pins the shapes against each other)."""
        df = self._mixed(spark).where("grp = 'g0'")
        grouped = sketches.priority_sample_summary_grouped(
            df, "grp", "key", "w", k=16
        ).drop("grp")
        glob = sketches.priority_sample_summary(df, "key", "w", k=16)
        assert grouped.collect()[0].asDict() == glob.collect()[0].asDict()
