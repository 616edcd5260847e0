"""Registry hygiene: every oracle parses under DuckDB, names are sane."""

from __future__ import annotations

import duckdb
import pytest

from pos_pipeline_core_etl_spark import registry
from tests.oracle_utils import duckdb_connection


@pytest.mark.slow  # default-budget cut (VERDICT r12 #2); runs with --runslow
def test_every_oracle_parses_under_duckdb():
    con = duckdb_connection("/root/testdata/sf0.001")
    try:
        for name, sql in registry.all_oracles().items():
            try:
                con.execute(f"EXPLAIN {sql}")
            except duckdb.Error as e:  # pragma: no cover - failure message aid
                raise AssertionError(f"oracle for {name!r} does not parse: {e}") from e
    finally:
        con.close()


def test_registry_names_unique_and_snake():
    names = list(registry.all_queries())
    assert len(names) == len(set(names))
    for n in names:
        assert n == n.lower() and " " not in n


def test_registry_size_floor():
    # the driver's t2 gate iterates this — shrinking it is a regression
    assert len(registry.all_queries()) >= 70
    assert len(registry.all_oracles()) >= 69


EXPECTED_QUERIES = frozenset(
    {
        # relational
        "scan_filter_project",
        "agg_pricing_summary",
        "join_broadcast_dims",
        "join_bigbig_revenue",
        "join_left_flag",
        "join_validity_window",
        "join_validity_window_bucketed",
        "agg_count_distinct",
        "dedup_keep_first",
        "duplicate_detection",
        "topk_orders",
        "topk_per_group",
        "set_except_keys",
        "union_by_name",
        "pivot_status_by_priority",
        "unpivot_measures",
        "monthly_rollup",
        "grand_totals_rollup",
        "horizontal_sum",
        "value_mode",
        # marts
        "payments_daily_mart",
        "sales_by_ticket_mart",
        "sales_by_group_mart",
        "transfers_cube_mart",
        "fact_payments_ticket",
        "fact_sales_item_line",
        "fact_transfers_line",
        # cleaning
        "fn_clean_strings",
        "silver_clean_payments",
        "fn_to_float_locale",
        "fn_to_float_expr",
        "fn_to_int",
        "fn_to_date_multi",
        "fn_accent_bucket",
        "fn_coerce_bool",
        "fn_safe_unit_cost",
        "fn_json_extract",
        # windows
        "calendar_zero_fill",
        "window_rolling_mean",
        "window_lag_delta",
        # qa
        "qa_sample_months",
        "qa_duplicates",
        "qa_nulls",
        "qa_non_negative",
        "qa_revenue_consistency",
        "qa_per_sucursal_ranges",
        "qa_missing_days",
        "qa_zscore_anomalies",
        "qa_zero_method_flags",
        "qa_monthly_sales",
        # llm ops
        "text_token_counts",
        "text_quality",
        "text_lang_id",
        "text_fingerprint",
        "text_vocabulary",
        "text_tfidf_topk",
        "text_decontaminate",
        "text_repetition",
        "text_pii_scan",
        "text_unigram_logprob",
        "dedup_exact_docs",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_minhash_components",
        "dedup_simhash",
        "dedup_embedding_cosine",
        "dedup_embedding_components",
        "sim_cosine_topk",
        "sim_lsh_bucket_topk",
        "sim_lsh_buckets_histogram",
        "sim_ivf_topk",
        "multimodal_features",
        "multimodal_frame_sample",
        "multimodal_resize",
        # forecasting
        "forecast_naive_lastweek",
        "forecast_deposit_schedule",
        "deposit_cash_flow",
        "forecast_loglinear",
        # streaming batch twins
        "events_tumbling_counts",
        "events_sessionization",
        "events_dedup",
        # analytics
        "sql_interface_revenue",
        "order_times_summary",
        "order_times_approx",
        "events_cardinality_sketch",
        "user_activity_gaps",
        "drop_null_rows",
        "sorted_distinct_dates",
        "bounded_sample",
        "branch_substring_filter",
        # round-3 additions
        "join_asof_purchase_view",
        "events_funnel",
        "events_retention",
        "dedup_minhash_verified",
        "stratified_sample",
        "text_pack_sequences",
        "text_chunk_windows",
        "dedup_cluster_sizes",
        "join_asof_next_purchase",
        "events_mad_anomalies",
        "dedup_decisions",
        # round-4 additions
        "text_decontaminate_bloom",
        "corpus_prep_decisions",
        "text_train_split",
        "docs_domain_quota",
        "text_shuffle_shards",
        "emb_quantize_int8",
        "scd2_orders_snapshot",
        "dedup_incremental_batch",
        "corpus_mixture_plan",
        "corpus_mixture_sample",
        "corpus_stats",
        "emb_dedup_decisions",
        # round-4 second pass
        "text_substring_dedup",
        "docs_weighted_sample",
        "emb_random_projection",
        "emb_kmeans_lloyd",
        "text_bpe_pairs",
        "text_bigram_logprob",
        "docs_quality_pct_rank",
        "corpus_shard_checksums",
        "events_windowed_topk",
        "text_dedup_spans",
        "events_user_features",
        "emb_kmeans_sse",
    }
)


def test_registry_exact_query_set():
    """A silent import failure must not shrink the claimed surface (ADVICE r1)."""
    assert set(registry.all_queries()) >= EXPECTED_QUERIES


def test_driver_window_front_loads_unchecked_queries():
    """The driver verifies the first 50 queries per round; queries absent from
    CORRECTNESS_r01.json must sit inside that window this round."""
    first_50 = list(registry.all_queries())[:50]
    for name in registry._PRIORITY[:50]:
        assert name in first_50


def test_documented_query_count_matches_registry():
    """The evidence docs are the public claim surface (VERDICT r2 item 5):
    the count README states must equal the live registry so the docs
    can't silently drift again."""
    import os
    import re

    readme = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "README.md")
    ).read()
    m = re.search(r"(\d+) queries, every one paired", readme)
    assert m, "README no longer documents the query count"
    assert int(m.group(1)) == len(registry.all_queries())


def test_performance_doc_counts_match_registry():
    """PERFORMANCE.md's sweep claims name a query count too (VERDICT r3
    item 5 — the README guard missed it); every 'all N (registry)
    queries' in the doc must equal the live registry."""
    import os
    import re

    perf = open(
        os.path.join(os.path.dirname(os.path.dirname(__file__)), "PERFORMANCE.md")
    ).read()
    counts = [
        int(m.group(1))
        for m in re.finditer(r"[Aa]ll (\d+) (?:registry )?queries", perf)
    ]
    assert counts, "PERFORMANCE.md no longer documents the sweep query count"
    for c in counts:
        assert c == len(registry.all_queries()), (
            f"PERFORMANCE.md claims {c} queries; registry has "
            f"{len(registry.all_queries())}"
        )


def test_replica_artifact_covers_registry_and_is_green():
    """The committed replica artifact (VERDICT r7 #5): the newest
    REPLICA_r*.json must cover EVERY registry query at BOTH SFs with
    zero failures — making the per-round all-names evidence inspectable
    instead of asserted. Regenerate with
    REPLICA_OUT=REPLICA_r<N>.json tools/verify_replica.py (once per SF)
    after adding queries."""
    import glob
    import json
    import os

    root = os.path.dirname(os.path.dirname(__file__))
    # Sort numerically on the round suffix (ADVICE r8): lexicographic
    # sort would put REPLICA_r10.json before REPLICA_r8.json and keep
    # validating a stale artifact from round 10 onward.
    import re

    arts = sorted(
        glob.glob(os.path.join(root, "REPLICA_r*.json")),
        key=lambda p: int(re.search(r"REPLICA_r(\d+)", p).group(1)),
    )
    if not arts:
        import pytest

        pytest.skip("no replica artifact committed yet (pre-round-8 tree)")
    with open(arts[-1]) as f:
        doc = json.load(f)
    assert set(doc) >= {"sf0.01", "sf0.1"}, f"{arts[-1]} missing an SF sweep"
    names = set(registry.all_queries())
    for sf_key in ("sf0.01", "sf0.1"):
        recorded = doc[sf_key]
        missing = names - set(recorded)
        assert not missing, f"{arts[-1]}[{sf_key}] missing {sorted(missing)[:5]}"
        bad = {n: r for n, r in recorded.items() if r["status"] == "fail"}
        assert not bad, f"{arts[-1]}[{sf_key}] has failures: {list(bad)[:5]}"


def test_zero_row_greens_have_constructed_fixture_twins():
    """Institutionalizes the round-8/9 vacuous-green discipline
    (VERDICT r8 #8): oracle agreement at zero rows proves both engines
    agree there is nothing to find, not that they'd agree when there
    is. Any registry query whose newest replica rows are 0 at BOTH SFs
    must appear below, mapped to the pytest test that forces non-empty
    output through the same code path — so a new silently-vacuous
    query fails THIS test until it gets a constructed fixture."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(__file__))
    arts = sorted(
        glob.glob(os.path.join(root, "REPLICA_r*.json")),
        key=lambda p: int(re.search(r"REPLICA_r(\d+)", p).group(1)),
    )
    if not arts:
        import pytest

        pytest.skip("no replica artifact committed yet")
    with open(arts[-1]) as f:
        doc = json.load(f)
    zero_both = {
        n
        for n, rec in doc.get("sf0.01", {}).items()
        if rec.get("rows") == 0
        and doc.get("sf0.1", {}).get(n, {}).get("rows") == 0
    }
    # query -> the constructed-fixture test proving the non-empty path
    ALLOWLIST = {
        # healthy-corpus overflow audits are CORRECTLY empty; the
        # degenerate-corpus fixtures force rows through the same code
        "dedup_containment_overflow": (
            "test_scale_ops.py::TestBucketSizeGuards (containment_overflow"
            " non-empty on the 12-clone corpus)"
        ),
        "fuzzy_customer_overflow": (
            "test_scale_ops.py::TestBucketSizeGuards (fuzzy_key_overflow"
            " non-empty at cap 2)"
        ),
        # a duplicate-free mart is the healthy state; the injected
        # duplicated (sucursal, fecha) day forces the non-empty path
        "qa_duplicates": (
            "test_scale_ops.py::TestDeVacuizedGreens::"
            "test_check_duplicates_flags_duplicated_day"
        ),
    }
    unexplained = zero_both - set(ALLOWLIST)
    assert not unexplained, (
        f"zero rows at BOTH SFs with no constructed-fixture allowlist "
        f"entry: {sorted(unexplained)} — add a pytest fixture that "
        f"forces non-empty output through the same code path, then "
        f"list it here"
    )
    # and the allowlist must not rot: entries must still be zero-row
    # (a query that grew real rows no longer needs the exemption)
    stale = set(ALLOWLIST) - zero_both
    assert not stale, f"allowlist entries no longer zero-row: {sorted(stale)}"


def test_zero_row_greens_at_single_sf_are_explained():
    """Per-SF extension of the zero-row discipline (ADVICE r9 #1 /
    VERDICT r9 #3): dedup_ngram_jaccard hid for a round by being
    non-empty at sf0.01 (where the driver looks) and empty at sf0.1 —
    the zero-at-BOTH meta test above cannot see that shape. A query
    empty at exactly one SF is either a parameter-choice bug or a
    documented scale asymmetry; both require an explicit entry here."""
    import glob
    import json
    import os
    import re

    root = os.path.dirname(os.path.dirname(__file__))
    arts = sorted(
        glob.glob(os.path.join(root, "REPLICA_r*.json")),
        key=lambda p: int(re.search(r"REPLICA_r(\d+)", p).group(1)),
    )
    if not arts:
        import pytest

        pytest.skip("no replica artifact committed yet")
    with open(arts[-1]) as f:
        doc = json.load(f)
    a, b = doc.get("sf0.01", {}), doc.get("sf0.1", {})
    zero_single = {
        n
        for n in set(a) | set(b)
        if (a.get(n, {}).get("rows") == 0) != (b.get(n, {}).get("rows") == 0)
    }
    # query -> why one SF is legitimately empty (none expected today:
    # every round-10 parameter was measured non-empty at BOTH SFs
    # before registering)
    SINGLE_SF_ALLOWLIST: dict[str, str] = {}
    unexplained = zero_single - set(SINGLE_SF_ALLOWLIST)
    assert not unexplained, (
        f"zero rows at exactly one SF with no explanation: "
        f"{sorted(unexplained)} — pick parameters that are non-empty at "
        f"both SFs (measure first!) or document the asymmetry here"
    )
    stale = set(SINGLE_SF_ALLOWLIST) - zero_single
    assert not stale, f"single-SF allowlist entries no longer apply: {sorted(stale)}"


def test_window_tiers_derive_from_artifacts():
    """The round-10 answer to three consecutive counts-in-prose drifts
    (VERDICT r9 #2): the driver window is BUILT from named tier tuples,
    and this test re-derives every tier from the committed
    CORRECTNESS_r*.json artifacts — no hand-written count can go stale
    without failing here.

    WINDOW_ROUND pins the artifact horizon: the r12 window was composed
    from rounds 1..11, so artifacts from round 12 onward (committed by
    the driver AFTER this window ran) must not flip the derivation."""
    import glob
    import json
    import os
    import re

    WINDOW_ROUND = 12

    root = os.path.dirname(os.path.dirname(__file__))
    latest: dict[str, int] = {}
    for path in glob.glob(os.path.join(root, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"CORRECTNESS_r(\d+)", path).group(1))
        if rnd >= WINDOW_ROUND:
            continue
        with open(path) as f:
            rows = json.load(f)
        for name in rows:
            latest[name] = max(latest.get(name, 0), rnd)

    names = set(registry.all_queries())
    never_checked = names - set(latest)
    assert set(registry._TIER_NEVER_CHECKED) == never_checked, (
        "never-checked tier out of sync with artifacts: "
        f"tier-only={sorted(set(registry._TIER_NEVER_CHECKED) - never_checked)}, "
        f"artifact-only={sorted(never_checked - set(registry._TIER_NEVER_CHECKED))}"
    )

    r7 = {n for n, r in latest.items() if r == 7}
    assert set(registry._TIER_RECERT_R7) == r7, (
        "r7 re-cert tier must be ALL r7-latest names (VERDICT r11 #3 — "
        "no r7 row may silently age out): tier-only="
        f"{sorted(set(registry._TIER_RECERT_R7) - r7)}, artifact-only="
        f"{sorted(r7 - set(registry._TIER_RECERT_R7))}"
    )

    r8 = sorted(n for n, r in latest.items() if r == 8)
    want = tuple(r8[: len(registry._TIER_SPILL_R8)])
    assert registry._TIER_SPILL_R8 == want, (
        "r8 spill tier must be the alphabetically-first r8-latest "
        f"names; expected {want[:5]}..., got {registry._TIER_SPILL_R8[:5]}..."
    )

    # values-changed names must already have a driver row (else they
    # belong in the never-checked tier)
    assert all(n in latest for n in registry._TIER_VALUES_CHANGED)

    # window shape: exactly 50 slots, no duplicates, all registered
    assert len(registry._PRIORITY) == 50
    assert len(set(registry._PRIORITY)) == 50
    assert set(registry._PRIORITY) <= names


def test_sketch_estimates_are_not_degenerate(spark):
    """SELFREVIEW r10 #1/#2 mechanized (VERDICT r10 #10): an estimate
    column whose per-group values are ALL EQUAL at sf0.01 is the
    signature of a degenerate domain choice (every group sees the same
    key set — the rejected partkey-KMV shape), and a vacuously-0/1
    similarity proves nothing.  The rule is applied MECHANICALLY to
    every ``sketch_*`` registry query, so a future sketch registration
    fails here until its domain genuinely varies per group:

    - multi-row frames: every estimate/jaccard column must take >1
      distinct value;
    - single-row similarity frames: every jaccard column must land
      strictly inside (0, 1)."""
    SF = "/root/testdata/sf0.01"
    names = [n for n in registry.all_queries() if n.startswith("sketch_")]
    assert names, "sketch family vanished from the registry"
    for name, fn in registry.all_queries().items():
        if not name.startswith("sketch_"):
            continue
        pdf = fn(spark, SF).toPandas()
        # column classes covered (VERDICT r11 #9 — every registered
        # sketch output class gets the backstop): KMV/CMS/histogram
        # point estimates ("estimate" substring catches kmv_estimate /
        # cms_estimate / q_estimate), jaccard similarities, *_kmv
        # region estimates, and the histogram's achieved-rank /
        # cut-bucket-share honesty columns — all-equal rank_frac or
        # bucket_share across rows is the all-mass-in-one-bucket
        # degenerate-span signature
        # (round 12: "bits_set" covers the Bloom word table — an
        # all-equal popcount across words is the all-bits-in-one-word
        # degenerate hash signature — and "fp_rate"/"n_candidates"
        # cover the semi-join audit, where an all-equal candidate
        # count across segments would mean the probe never
        # discriminated)
        est_cols = [
            c
            for c in pdf.columns
            if "estimate" in c
            or c.startswith("jaccard")
            or c.endswith("_kmv")
            or c
            in (
                "rank_frac",
                "bucket_share",
                "bits_set",
                "n_candidates",
                "fp_rate",
            )
        ]
        assert est_cols, f"{name}: no estimate column to eyeball"
        for c in est_cols:
            if len(pdf) > 1:
                assert pdf[c].nunique() > 1, (
                    f"{name}.{c} is all-equal across {len(pdf)} groups — "
                    "degenerate domain (every group sees the same keys?)"
                )
            elif c.startswith("jaccard"):
                v = float(pdf[c].iloc[0])
                assert 0.0 < v < 1.0, (
                    f"{name}.{c} = {v} is vacuous (disjoint or identical sets)"
                )
            else:
                assert float(pdf[c].iloc[0]) > 0.0, f"{name}.{c} vacuous"
