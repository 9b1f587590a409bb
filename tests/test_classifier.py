"""Logistic-regression classifier (operators/classifier.py) vs numpy."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from apache_beam_spark.operators.classifier import (
    FEATURE_NAMES, featurize, lr_score, lr_train)
from tests.conftest import SF_DIR

D = len(FEATURE_NAMES)


@pytest.fixture(scope="module")
def labeled(spark):
    from apache_beam_spark.sources.tables import load_table

    d = load_table(spark, "documents", SF_DIR)
    noise = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                1, 4), 16, 10).cast("long") % 401) - 200
    return d.withColumn("y", ((F.col("n_chars") + noise) > 300).cast("int"))


def _numpy_train(x, y, iters, lr):
    """The exact loop lr_train runs: standardize, zero-init GD,
    fold scaling back."""
    mu, sd = x.mean(0), x.std(0)
    sd = np.where(sd < 1e-12, 1.0, sd)
    mu[0], sd[0] = 0.0, 1.0
    xs = (x - mu) / sd
    w = np.zeros(D)
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xs @ w)))
        w = w - lr * (xs.T @ (p - y)) / len(y)
    raw = w / sd
    raw[0] = w[0] - float(np.sum(w[1:] * mu[1:] / sd[1:]))
    return raw


def test_train_matches_numpy(labeled):
    rows = featurize(labeled).select(
        *[f"f{i}" for i in range(D)], "y").collect()
    x = np.array([[r[f"f{i}"] for i in range(D)] for r in rows])
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    got = np.array(lr_train(labeled, "y", iters=25, lr=0.5))
    ref = _numpy_train(x, y, iters=25, lr=0.5)
    np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-9)


def _numpy_newton(x, y, iters):
    """The exact loop lr_train(solver='newton') runs: standardize,
    zero-init Newton/IRLS with tiny ridge + step-norm early stop,
    fold scaling back.  Returns (weights, passes_used)."""
    mu, sd = x.mean(0), x.std(0)
    sd = np.where(sd < 1e-12, 1.0, sd)
    mu[0], sd[0] = 0.0, 1.0
    xs = (x - mu) / sd
    w = np.zeros(D)
    n = len(y)
    passes = 0
    for _ in range(iters):
        p = 1.0 / (1.0 + np.exp(-(xs @ w)))
        g = xs.T @ (p - y)
        h = (xs * (p * (1.0 - p))[:, None]).T @ xs
        step = np.linalg.solve(h + 1e-8 * n * np.eye(D), g)
        w = w - step
        passes += 1
        if float(np.max(np.abs(step))) < 1e-10:
            break
    raw = w / sd
    raw[0] = w[0] - float(np.sum(w[1:] * mu[1:] / sd[1:]))
    return raw, passes


def _loss(x, y, w):
    p = 1.0 / (1.0 + np.exp(-(x @ w)))
    eps = 1e-12
    return float(-np.mean(y * np.log(p + eps)
                          + (1 - y) * np.log(1 - p + eps)))


def test_newton_matches_numpy_and_bounds_passes(labeled):
    rows = featurize(labeled).select(
        *[f"f{i}" for i in range(D)], "y").collect()
    x = np.array([[r[f"f{i}"] for i in range(D)] for r in rows])
    y = np.array([r["y"] for r in rows], dtype=np.float64)
    got = np.array(lr_train(labeled, "y", iters=10, solver="newton"))
    ref, passes = _numpy_newton(x, y, iters=10)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-8)
    # bounded-pass claim: Newton at <=10 passes beats 30-pass GD's loss
    assert passes <= 10
    gd = np.array(lr_train(labeled, "y", iters=30, lr=0.5))
    assert _loss(x, y, got) <= _loss(x, y, gd)


def test_newton_rejects_unknown_solver(labeled):
    with pytest.raises(ValueError, match="solver"):
        lr_train(labeled, "y", solver="adam")


def test_learns_planted_signal(labeled):
    w = lr_train(labeled, "y", iters=40, lr=0.5)
    acc = lr_score(labeled, w).select(
        F.avg((F.col("pred") == F.col("y")).cast("double"))).collect()[0][0]
    assert acc >= 0.6                 # noisy planted target, small SF
    # non-degenerate: both classes predicted
    preds = {r["pred"] for r in
             lr_score(labeled, w).select("pred").distinct().collect()}
    assert preds == {0, 1}


def test_score_is_narrow_codegen(labeled):
    """Scoring must be a pure per-row projection — no shuffle, no
    Python."""
    out = lr_score(labeled, [-6.0, 1.0, 2.0, 1.5, -4.0, 0.2])
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan


def test_no_leaked_cache(spark, labeled):
    """lr_train's feature caches are scope-released on return.
    Asserted as a set delta of persistent-RDD ids (an absolute ==0
    count races other tests' stale entries and the async
    ContextCleaner, VERDICT r13 item 1)."""
    from apache_beam_spark.plans.caching import persistent_rdd_ids

    sc = spark.sparkContext
    base_ids = persistent_rdd_ids(sc)
    lr_train(labeled, "y", iters=2, lr=0.5)
    assert not (persistent_rdd_ids(sc) - base_ids)
