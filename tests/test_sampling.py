"""Property tests for the deterministic sampling operators
(operators/sampling.py), int8 quantization, and the SCD-2 snapshot.

The oracle-parity sweep proves cross-engine equality; these tests pin
the SEMANTIC contracts: hash-stability under corpus growth, exact quota
arithmetic, permutation validity, quantization error bounds, and SCD-2
window invariants.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from pos_pipeline_core_etl_spark.operators import sampling, similarity

SF = "/root/testdata/sf0.001"


def _docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


class TestTrainSplit:
    def test_partition_of_corpus(self, spark):
        docs = _docs(spark)
        out = sampling.train_split(docs)
        assert out.count() == docs.count()
        splits = {r["split"] for r in out.select("split").distinct().collect()}
        assert splits <= {"train", "validation", "test"}
        # 98/1/1 boundaries: train dominates
        counts = dict(
            out.groupBy("split").count().rdd.map(lambda r: (r["split"], r["count"])).collect()
        )
        assert counts["train"] > 0.9 * docs.count()

    def test_stable_under_corpus_growth(self, spark):
        """The property rank-based splits lack: restricting the corpus
        to a subset never changes a surviving doc's assignment."""
        docs = _docs(spark)
        full = {r["doc_id"]: r["split"] for r in sampling.train_split(docs).collect()}
        subset = sampling.train_split(docs.where(F.col("doc_id") % 3 == 0))
        for r in subset.collect():
            assert full[r["doc_id"]] == r["split"]


class TestDomainQuota:
    def test_cap_enforced_per_source(self, spark):
        out = sampling.domain_quota(_docs(spark))
        cap = sampling.QUOTA_SHARDS * sampling.CAP_PER_SHARD
        per_source = out.groupBy("source").count().collect()
        assert per_source, "quota output empty"
        for r in per_source:
            assert r["count"] <= cap
        # fixture sources hold 25 docs each — the cap must actually bind
        assert max(r["count"] for r in per_source) <= cap
        total_in = _docs(spark).count()
        assert out.count() < total_in

    def test_shard_cap_exact(self, spark):
        out = sampling.domain_quota(_docs(spark))
        per_shard = out.groupBy("source", "shard_id").count().collect()
        for r in per_shard:
            assert r["count"] <= sampling.CAP_PER_SHARD

    def test_survivors_deterministic(self, spark):
        a = {r["doc_id"] for r in sampling.domain_quota(_docs(spark)).collect()}
        b = {r["doc_id"] for r in sampling.domain_quota(_docs(spark)).collect()}
        assert a == b


class TestShuffleShards:
    def test_valid_permutation(self, spark):
        docs = _docs(spark)
        out = sampling.shuffle_shards(docs)
        assert out.count() == docs.count()
        # positions within a shard are exactly 1..n_shard
        agg = out.groupBy("shard_id").agg(
            F.count(F.lit(1)).alias("n"),
            F.min("pos").alias("lo"),
            F.max("pos").alias("hi"),
            F.countDistinct("pos").alias("npos"),
        )
        for r in agg.collect():
            assert (r["lo"], r["hi"], r["npos"]) == (1, r["n"], r["n"])

    def test_not_id_ordered(self, spark):
        """The permutation must actually shuffle: within-shard position
        order must not equal doc_id order."""
        out = sampling.shuffle_shards(_docs(spark)).where(F.col("shard_id") == 0)
        rows = sorted(out.collect(), key=lambda r: r["pos"])
        ids = [r["doc_id"] for r in rows]
        assert ids != sorted(ids)


class TestQuantizeInt8:
    def test_codes_bounded_and_error_small(self, spark):
        emb = spark.read.parquet(f"{SF}/embeddings.parquet")
        out = similarity.quantize_int8(emb).collect()
        assert len(out) == emb.count()
        for r in out:
            # |q_i| <= 127 ⇒ L1 of a 64-dim code <= 64*127
            assert r["q_l1"] <= 64 * 127
            # max elementwise error is scale/2 ⇒ mse <= (maxabs/254)^2
            if r["maxabs"] > 0:
                assert r["mse"] <= (r["maxabs"] / 254.0) ** 2 + 1e-12

    def test_zero_vector_all_zero_codes(self, spark):
        df = spark.createDataFrame(
            [(1, [0.0] * 4), (2, [1.0, -2.0, 0.5, 0.25])], "vec_id long, embedding array<double>"
        )
        rows = {r["vec_id"]: r for r in similarity.quantize_int8(df).collect()}
        assert rows[1]["q_sum"] == 0 and rows[1]["q_l1"] == 0 and rows[1]["mse"] == 0.0
        # max-component code is exactly ±127
        assert rows[2]["q_l1"] >= 127


class TestScd2Snapshot:
    def test_window_invariants(self, spark):
        from pos_pipeline_core_etl_spark.plans.relational import scd2_orders_snapshot

        snap = scd2_orders_snapshot(spark, SF)
        # exactly one current version per customer
        cur = snap.where(F.col("is_current")).groupBy("custkey").count()
        assert cur.where(F.col("count") != 1).count() == 0
        # closed windows end at-or-after their start (equal dates allowed
        # for same-day versions) and never after the key's current start
        bad = snap.where(F.col("valid_to") < F.col("valid_from"))
        assert bad.count() == 0
        # row preservation: every order appears exactly once
        orders = spark.read.parquet(f"{SF}/orders.parquet")
        assert snap.count() == orders.count()
        assert snap.select("orderkey").distinct().count() == orders.count()


class TestIncrementalBatchDedup:
    def test_decisions_batch_only_and_classes(self, spark):
        from pos_pipeline_core_etl_spark.operators.dedup import (
            incremental_batch_decisions,
        )

        docs = _docs(spark)
        out = incremental_batch_decisions(docs)
        rows = out.collect()
        # one row per batch doc, batch docs only
        batch_ids = {
            r["doc_id"] for r in docs.where(F.col("doc_id") % 10 == 7).collect()
        }
        assert {r["doc_id"] for r in rows} == batch_ids
        # dup_of is a CORPUS doc (never a batch doc) and null iff new
        for r in rows:
            if r["decision"] == "new":
                assert r["dup_of"] is None
            else:
                assert r["dup_of"] is not None
                assert r["dup_of"] % 10 != 7

    def test_exact_dup_detected(self, spark):
        """A batch doc with a corpus-identical text must label dup_exact
        with the corpus doc as canonical."""
        from pos_pipeline_core_etl_spark.operators.dedup import (
            incremental_batch_decisions,
        )

        df = spark.createDataFrame(
            [
                (3, "alpha beta gamma delta"),   # corpus
                (17, "alpha beta gamma delta"),  # batch, exact dup of 3
                (27, "totally unrelated text here xyz"),  # batch, new
            ],
            "doc_id long, text string",
        )
        rows = {r["doc_id"]: r for r in incremental_batch_decisions(df).collect()}
        assert rows[17]["decision"] == "dup_exact" and rows[17]["dup_of"] == 3
        assert rows[27]["decision"] == "new" and rows[27]["dup_of"] is None


class TestMixture:
    def test_plan_budget_math(self, spark):
        plan = {r["lang"]: r for r in sampling.mixture_plan(_docs(spark)).collect()}
        # every target language present and integer-consistent
        assert set(plan) == set(sampling.MIXTURE_TARGETS)
        budget = min(
            100 * r["n_docs"] // r["target_share"] for r in plan.values()
        )
        for lang, r in plan.items():
            assert r["n_target"] == budget * r["target_share"] // 100
            assert 0 < r["keep_permille"] <= 1000
        # the binding language keeps (nearly) everything
        binding = min(plan, key=lambda b: 100 * plan[b]["n_docs"] // plan[b]["target_share"])
        assert plan[binding]["keep_permille"] == 1000

    def test_sample_tracks_targets(self, spark):
        docs = _docs(spark)
        plan = {r["lang"]: r for r in sampling.mixture_plan(docs).collect()}
        got = {
            r["lang"]: r["count"]
            for r in sampling.mixture_sample(docs).groupBy("lang").count().collect()
        }
        for lang, r in plan.items():
            # hash selector is uniform: realized count within ±35% of
            # the target (small per-lang counts at sf0.001)
            assert abs(got.get(lang, 0) - r["n_target"]) <= max(8, 0.35 * r["n_target"])

    def test_untargeted_language_dropped(self, spark):
        docs = _docs(spark).withColumn(
            "lang",
            F.when(F.col("doc_id") % 97 == 0, F.lit("xx")).otherwise(F.col("lang")),
        )
        out = sampling.mixture_sample(docs)
        assert out.where(F.col("lang") == "xx").count() == 0


class TestDomainQuotaSkew:
    def test_hot_domain_capped_and_bounded_partitions(self, spark):
        """A domain holding ~100x the others must still be capped
        exactly, with its window work split across shards (the
        scale-killer the sharded window exists for)."""
        from pyspark.sql import functions as F2

        hot = spark.range(5000).select(
            F2.col("id").alias("doc_id"), F2.lit("hot").alias("source")
        )
        cold = spark.range(5000, 5050).select(
            F2.col("id").alias("doc_id"), F2.lit("cold").alias("source")
        )
        out = sampling.domain_quota(hot.unionByName(cold))
        counts = {r["source"]: r["count"] for r in out.groupBy("source").count().collect()}
        cap = sampling.QUOTA_SHARDS * sampling.CAP_PER_SHARD
        assert counts["hot"] == cap  # every shard of a hot domain fills
        assert counts["cold"] <= cap
        # survivors are spread across all shards, not one
        shards = out.where(F2.col("source") == "hot").select("shard_id").distinct().count()
        assert shards == sampling.QUOTA_SHARDS


class TestWeightedSample:
    """Efraimidis–Spirakis priority sampling (plans/llm_ops.py::
    docs_weighted_sample): determinism + weight monotonicity."""

    def test_deterministic_and_plan_is_topk(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import docs_weighted_sample

        a = docs_weighted_sample(spark, "/root/testdata/sf0.001").toPandas()
        b = docs_weighted_sample(spark, "/root/testdata/sf0.001").toPandas()
        assert a.equals(b)
        plan = (
            docs_weighted_sample(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "TakeOrderedAndProject" in plan  # top-k heap, no global sort

    def test_heavier_docs_overrepresented(self, spark):
        """ES sampling draws size-proportionally: the sampled mean
        n_chars must exceed the corpus mean."""
        import duckdb

        from pos_pipeline_core_etl_spark.plans.llm_ops import docs_weighted_sample

        out = docs_weighted_sample(spark, "/root/testdata/sf0.01").toPandas()
        con = duckdb.connect()
        corpus_mean = con.execute(
            "SELECT avg(n_chars) FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
        ).fetchone()[0]
        con.close()
        assert out["n_chars"].mean() > corpus_mean

    def test_topk_not_tie_degenerate(self, spark):
        """Ranking must happen on the UNROUNDED priority: coarse
        rounding before the rank collapses likely winners into one tie
        broken by doc_id, degenerating the sample into lowest-id
        selection (ADVICE r4). Emitted priorities must therefore be
        (essentially) all distinct and the pick must not be the lowest
        100 doc_ids."""
        from pos_pipeline_core_etl_spark.plans.llm_ops import (
            WEIGHTED_SAMPLE_K,
            docs_weighted_sample,
        )

        out = docs_weighted_sample(spark, "/root/testdata/sf0.01").toPandas()
        assert out["priority"].nunique() >= WEIGHTED_SAMPLE_K - 1
        lowest_ids = set(range(WEIGHTED_SAMPLE_K))
        assert set(out["doc_id"]) != lowest_ids


class TestRandomProjection:
    """JL random projection (plans/llm_ops.py::emb_random_projection):
    map-side-only plan + distance-correlation preservation."""

    def test_zero_exchange_plan(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import emb_random_projection

        plan = (
            emb_random_projection(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Exchange" not in plan

    def test_distance_correlation(self, spark):
        """Pairwise distances in the 8-dim sketch must correlate
        strongly with the original 64-dim distances (JL guarantee at
        this compression is loose per-pair but tight in rank terms)."""
        import numpy as np
        import pandas as pd

        from pos_pipeline_core_etl_spark.plans.llm_ops import emb_random_projection

        proj = (
            emb_random_projection(spark, "/root/testdata/sf0.01")
            .orderBy("vec_id")
            .limit(60)
            .toPandas()
        )
        orig = (
            spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
            .orderBy("vec_id")
            .limit(60)
            .toPandas()
        )
        P = proj[[f"p{i}" for i in range(8)]].to_numpy()
        V = np.stack(orig["embedding"].to_numpy())
        dp = np.linalg.norm(P[:, None, :] - P[None, :, :], axis=2).ravel()
        dv = np.linalg.norm(V[:, None, :] - V[None, :, :], axis=2).ravel()
        r = float(np.corrcoef(dp, dv)[0, 1])
        # calibration: a TRUE-random 64->8 projection of isotropic data
        # yields r ~ 0.46 (JL relative error ~ sqrt(1/8)); the
        # deterministic family must land in the same regime, not below it
        assert r > 0.3, r

    def test_variance_factor_unbiased(self, spark):
        """Docstring contract: E[proj_j^2] = ||v||^2 / 3, so
        3/out_dim * sum_j proj_j^2 estimates ||v||^2. The corpus-mean
        ratio must sit near 1."""
        import numpy as np

        from pos_pipeline_core_etl_spark.plans.llm_ops import emb_random_projection

        proj = emb_random_projection(spark, "/root/testdata/sf0.01").orderBy("vec_id").toPandas()
        orig = (
            spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
            .orderBy("vec_id")
            .toPandas()
        )
        P = proj[[f"p{i}" for i in range(8)]].to_numpy()
        V = np.stack(orig["embedding"].to_numpy())
        est = (P**2).sum(axis=1) * 3.0 / 8.0
        true = (V.astype(float) ** 2).sum(axis=1)
        ratio = float((est / true).mean())
        assert 0.8 < ratio < 1.2, ratio


class TestBpeAndBigram:
    """Tokenizer-pair counting and bigram-LM scoring built on crafted
    corpora with hand-computable answers."""

    def test_bpe_pair_counts(self, spark):
        from pos_pipeline_core_etl_spark.operators import text as T

        # "a b a b a" -> pairs: a b, b a, a b, b a -> counts 2/2
        df = spark.createDataFrame(
            [(1, "a b a b a"), (2, "a b c")], ["doc_id", "text"]
        )
        t = T.tokens_col(F.lower(F.col("text")))
        pairs = df.select(
            F.explode(
                F.zip_with(
                    F.slice(t, 1, F.size(t) - 1),
                    F.slice(t, 2, F.size(t) - 1),
                    lambda a, b: F.concat(a, F.lit(" "), b),
                )
            ).alias("pair")
        )
        got = {
            r["pair"]: r["n"]
            for r in pairs.groupBy("pair").agg(F.count(F.lit(1)).alias("n")).collect()
        }
        assert got == {"a b": 3, "b a": 2, "b c": 1}

    def test_bigram_logprob_hand_computed(self, spark):
        """Two docs over a 2-token vocab: verify p(b|a) add-one math."""
        import math

        from pos_pipeline_core_etl_spark.operators.text import bigram_logprob

        df = spark.createDataFrame([(1, "a b"), (2, "a b")], ["doc_id", "text"])
        out = {r["doc_id"]: r for r in bigram_logprob(df).collect()}
        # corpus: pair "a b" x2; ctx "a" x2; V=2 -> p = (2+1)/(2+2) = 0.75
        want = -math.log(3.0 / 4.0)
        assert out[1]["n_bigrams"] == 1
        assert abs(out[1]["mean_neg_logprob"] - round(want, 6)) < 1e-9

    def test_bigram_flags_repetition_lower_than_unigram_would(self, spark):
        """A doc that endlessly repeats one bigram scores LOW bigram
        surprise vs a varied doc of the same unigram mix — the signal
        this operator adds."""
        from pos_pipeline_core_etl_spark.operators.text import bigram_logprob

        rep = "x y " * 30
        varied = "x y y x x x y y x y x x y y y x y x x y " * 3
        df = spark.createDataFrame(
            [(1, rep.strip()), (2, varied.strip())], ["doc_id", "text"]
        )
        out = {r["doc_id"]: r["mean_neg_logprob"] for r in bigram_logprob(df).collect()}
        assert out[1] < out[2]


class TestQualityPctRank:
    def test_rank_is_within_source_and_uniform(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import docs_quality_pct_rank

        out = docs_quality_pct_rank(spark, "/root/testdata/sf0.001").toPandas()
        # per source: pct ranks span [0, 1] and the max is exactly 1
        for _, g in out.groupby("source"):
            assert g["quality_pct"].min() == 0.0
            if len(g) > 1:
                assert g["quality_pct"].max() == 1.0

    def test_window_is_hash_partitioned(self, spark):
        """The window must run per-source (hashpartitioning), never a
        single global partition."""
        from pos_pipeline_core_etl_spark.plans.llm_ops import docs_quality_pct_rank

        plan = (
            docs_quality_pct_rank(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "hashpartitioning(source" in plan
        assert "SinglePartition" not in plan


class TestShardChecksums:
    """Export integrity manifest (plans/llm_ops.py::
    corpus_shard_checksums): order independence and corruption
    sensitivity — the two properties that make it a valid manifest."""

    def test_counts_match_shuffle_shards(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import corpus_shard_checksums

        docs = _docs(spark)
        manifest = {
            r["shard_id"]: r for r in corpus_shard_checksums(spark, SF).collect()
        }
        shards = sampling.shuffle_shards(docs).groupBy("shard_id").count().collect()
        assert {r["shard_id"]: r["count"] for r in shards} == {
            s: r["n_docs"] for s, r in manifest.items()
        }

    def test_partition_order_invariant(self, spark):
        """Repartitioning the input must not change any checksum (xor is
        commutative) — the property a plain hash-of-concatenation lacks."""
        from pos_pipeline_core_etl_spark.plans.llm_ops import corpus_shard_checksums

        a = {r["shard_id"]: r["checksum"] for r in corpus_shard_checksums(spark, SF).collect()}
        # same computation over a differently-partitioned clone
        docs = _docs(spark).repartition(13, "text")
        from pyspark.sql import functions as F2

        from pos_pipeline_core_etl_spark.operators.sampling import (
            SHUFFLE_SHARDS,
            hash_selector,
        )

        digest = F2.conv(
            F2.substring(F2.md5(F2.concat_ws("|", F2.col("doc_id"), F2.col("text"))), 1, 15),
            16,
            10,
        ).cast("long")
        b = {
            r["shard_id"]: r["checksum"]
            for r in docs.select(
                hash_selector(F2.col("doc_id"), "shuf", SHUFFLE_SHARDS).alias("shard_id"),
                digest.alias("digest"),
            )
            .groupBy("shard_id")
            .agg(F2.expr("bit_xor(digest)").alias("checksum"))
            .collect()
        }
        assert a == b

    def test_single_doc_corruption_flips_checksum(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import corpus_shard_checksums
        from pyspark.sql import functions as F2

        clean = {r["shard_id"]: r["checksum"] for r in corpus_shard_checksums(spark, SF).collect()}
        # corrupt exactly one document's text via a temp view override
        docs = _docs(spark).withColumn(
            "text",
            F2.when(F2.col("doc_id") == 7, F2.concat(F2.col("text"), F2.lit("X"))).otherwise(
                F2.col("text")
            ),
        )
        from pos_pipeline_core_etl_spark.operators.sampling import (
            SHUFFLE_SHARDS,
            hash_selector,
        )
        from pos_pipeline_core_etl_spark.operators.text import tokens_col

        digest = F2.conv(
            F2.substring(F2.md5(F2.concat_ws("|", F2.col("doc_id"), F2.col("text"))), 1, 15),
            16,
            10,
        ).cast("long")
        dirty = {
            r["shard_id"]: r["checksum"]
            for r in docs.select(
                hash_selector(F2.col("doc_id"), "shuf", SHUFFLE_SHARDS).alias("shard_id"),
                digest.alias("digest"),
            )
            .groupBy("shard_id")
            .agg(F2.expr("bit_xor(digest)").alias("checksum"))
            .collect()
        }
        flipped = [s for s in clean if clean[s] != dirty.get(s)]
        assert len(flipped) == 1  # exactly the shard holding doc 7


class TestWindowedTopk:
    def test_k_rows_per_day_and_rank_order(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import (
            TRENDING_K,
            events_windowed_topk,
        )

        out = events_windowed_topk(spark, "/root/testdata/sf0.01").toPandas()
        for day, g in out.groupby("day"):
            assert len(g) <= TRENDING_K
            assert list(g["rnk"]) == list(range(1, len(g) + 1))
            # counts non-increasing down the ranks
            assert list(g["n"]) == sorted(g["n"], reverse=True)


class TestUserFeatures:
    def test_one_shuffle_no_expand(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import events_user_features

        plan = (
            events_user_features(spark, "/root/testdata/sf0.001")
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "Expand" not in plan  # count_distinct planned two-level
        # exactly one data-sized exchange on user_id (plus the orderBy's
        # range exchange over aggregate-sized rows)
        assert plan.count("hashpartitioning(user_id") >= 1

    def test_counts_reconcile(self, spark):
        from pos_pipeline_core_etl_spark.plans.llm_ops import (
            USER_EVENT_TYPES,
            events_user_features,
        )

        df = events_user_features(spark, "/root/testdata/sf0.001").toPandas()
        per_type_sum = df[[f"n_{t}" for t in USER_EVENT_TYPES]].sum(axis=1)
        assert (per_type_sum == df["n_events"]).all()
        assert (df["active_days"] <= df["span_days"]).all()
