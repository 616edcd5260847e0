"""Distributed logistic-regression classifier (operators/classifier.py).

Three layers: (1) the relational GD reproduces a plain-numpy
implementation of the SAME quantized full-batch iteration exactly;
(2) on separable data the GD actually learns (the registry corpus has
no signal, so the oracle-parity tests alone can't prove learning);
(3) plan shape — training collects one bounded d+1-long aggregate per
epoch and returns a literal weight projection (r13): no corpus-vs-
weights join, no exchange in the returned frame.
"""

from __future__ import annotations

import numpy as np
import pytest

from pos_pipeline_core_etl_spark.operators import classifier


def _numpy_gd(X, y, iters, rate, quant):
    """Reference: identical quantized full-batch GD in plain numpy."""
    n, d = X.shape
    w = np.zeros(d)
    for _ in range(iters):
        # replicate the left-assoc fold exactly: small d, plain loop
        margin = np.zeros(n)
        for i in range(n):
            acc = 0.0
            for j in range(d):
                acc = acc + w[j] * X[i, j]
            margin[i] = acc
        p = 1.0 / (1.0 + np.exp(-margin))
        g = np.zeros(d)
        for j in range(d):
            contrib = np.floor((p - y) * X[:, j] * quant + 0.5)
            g[j] = contrib.sum()
        for j in range(d):
            w[j] = w[j] - rate * (g[j] / (n * quant))
    return w


def _feats_df(spark, rows):
    return spark.createDataFrame(
        [(i, float(y), 1.0, x1, x2, x3, x4) for i, (y, x1, x2, x3, x4) in enumerate(rows)],
        "doc_id long, y double, x0 double, x1 double, x2 double, x3 double, x4 double",
    )


def test_gd_matches_numpy_reference(spark):
    rng = np.random.RandomState(7)
    raw = rng.uniform(-2, 2, size=(40, 4)).round(6)
    ys = rng.randint(0, 2, size=40)
    rows = [(int(ys[i]), *map(float, raw[i])) for i in range(40)]
    feats = _feats_df(spark, rows)
    got = classifier.logistic_gd(feats, iters=3, rate=0.5, quant=1 << 26).collect()[0]
    X = np.hstack([np.ones((40, 1)), raw])
    want = _numpy_gd(X, ys.astype(float), iters=3, rate=0.5, quant=1 << 26)
    for j in range(5):
        assert got[f"w{j}"] == pytest.approx(want[j], abs=1e-9), f"w{j}"


def test_gd_learns_separable(spark):
    """y = 1 iff x1 > 0, wide margin: trained model must classify >95%."""
    rng = np.random.RandomState(11)
    x1 = np.concatenate([rng.uniform(0.5, 2.0, 60), rng.uniform(-2.0, -0.5, 60)])
    ys = (x1 > 0).astype(int)
    noise = rng.uniform(-1, 1, size=(120, 3)).round(6)
    rows = [
        (int(ys[i]), float(round(x1[i], 6)), *map(float, noise[i]))
        for i in range(120)
    ]
    feats = _feats_df(spark, rows)
    w = classifier.logistic_gd(feats, iters=30, rate=2.0)
    scored = classifier.lr_scores(feats, w)
    ev = classifier.lr_eval(scored).collect()[0]
    assert ev["tp"] + ev["fp"] + ev["tn"] + ev["fn"] == 120
    assert ev["accuracy"] > 0.95


def test_eval_counts_consistent(spark):
    rows = [(1, 0.5, 0.1, 0.2, 0.3), (0, -0.5, 0.0, 0.1, 0.2), (1, 1.5, 0.2, 0.0, 0.1)]
    feats = _feats_df(spark, rows)
    w = classifier.logistic_gd(feats, iters=2, rate=0.5)
    ev = classifier.lr_eval(classifier.lr_scores(feats, w)).collect()[0]
    assert ev["tp"] + ev["fp"] + ev["tn"] + ev["fn"] == 3


def test_train_plan_shape(spark):
    """r13 contract: training collects only the d+1 aggregate longs per
    epoch and inlines the weights as literals, so the RETURNED weight
    frame is a pure literal projection over a 1-row Range — no join of
    the corpus against weights anywhere, no exchange, and every
    downstream consumer (scoring, stacking) starts from literals."""
    rng = np.random.RandomState(3)
    rows = [
        (int(rng.randint(0, 2)), *[float(x) for x in rng.uniform(-1, 1, 4).round(6)])
        for _ in range(20)
    ]
    feats = _feats_df(spark, rows)
    w = classifier.logistic_gd(feats, iters=3, rate=0.5)
    plan = w._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert "Exchange" not in plan
    assert "Range" in plan
    # the literal-weights rewrite must reproduce the broadcast-chain
    # form's arithmetic bit-for-bit: same aggregates collected, same
    # IEEE update expression — re-derive one epoch by hand and compare
    one = classifier.logistic_gd(feats, iters=1, rate=0.5)
    row = feats.selectExpr(
        *[
            f"CAST(floor((1.0 / (1.0 + exp(-(0.0D * x0 + 0.0D * x1 + 0.0D * x2 "
            f"+ 0.0D * x3 + 0.0D * x4))) - y) * x{k} * {float(classifier.LR_QUANT)} "
            f"+ 0.5D) AS BIGINT) AS g{k}"
            for k in range(classifier.N_FEATURES)
        ]
    ).groupBy().sum().collect()[0]
    n = len(rows)
    expected = [
        0.0 - 0.5 * (row[k] / (n * float(classifier.LR_QUANT)))
        for k in range(classifier.N_FEATURES)
    ]
    got = one.collect()[0]
    assert [got[f"w{k}"] for k in range(classifier.N_FEATURES)] == expected

    with pytest.raises(ValueError):
        classifier.logistic_gd(feats, iters=0)


def test_train_empty_corpus_yields_empty_weights(spark):
    """The pre-r13 broadcast-chain form produced an EMPTY weight frame
    on an empty corpus (zero agg groups); the literal form preserves
    that contract instead of dividing by n=0."""
    feats = _feats_df(spark, []).where("y > 1")  # provably empty
    w = classifier.logistic_gd(feats, iters=2, rate=0.5)
    assert w.count() == 0
    assert sorted(w.columns) == [f"w{j}" for j in range(classifier.N_FEATURES)]


class TestCalibrationBins:
    """Multi-bin reliability leg, proven on a constructed score spread
    (the registered query's synthetic corpus collapses to one bin —
    the trained model has no signal — so oracle agreement there never
    exercises the binning): a perfectly calibrated spread must land
    each score in its decile with obs_rate == mean_p's bin, and p=1.0
    must fold into bin 9, not a phantom bin 10."""

    def test_bins_and_top_edge(self, spark):
        from pos_pipeline_core_etl_spark.operators.classifier import (
            calibration_bins,
        )

        rows = []
        did = 0
        for b in range(10):
            p = b / 10 + 0.05  # mid-decile
            for i in range(10):
                rows.append((did, 1 if i < b else 0, p, 0))  # b positives
                did += 1
        rows.append((did, 1, 1.0, 1))  # exact top edge
        df = spark.createDataFrame(rows, "doc_id long, y long, p double, pred long")
        got = {r.bin: r for r in calibration_bins(df).collect()}
        assert sorted(got) == list(range(10))  # ten bins, no bin 10
        assert got[9]["n"] == 11  # p=1.0 folded into the top decile
        for b in range(9):
            assert got[b]["n"] == 10
            assert abs(got[b]["mean_p"] - (b / 10 + 0.05)) < 1e-9
            # exactly b positives out of 10 in bin b
            assert abs(got[b]["obs_rate"] - b / 10) < 1e-9
