"""k-means (similarity/kmeans.py) vs a numpy reference implementation."""

from __future__ import annotations

import numpy as np
import pytest

from apache_beam_spark.similarity.kmeans import kmeans, kmeans_assign, kmeans_fit


def _ref_kmeans(x, k, n_iter):
    cents = x[:k].copy()
    for _ in range(n_iter):
        d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        a = d.argmin(axis=1)
        for c in range(k):
            if (a == c).any():
                cents[c] = x[a == c].mean(axis=0)
    d = ((x[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
    return cents, d.argmin(axis=1)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(7)
    # 3 well-separated blobs in 4-d
    blobs = [rng.randn(40, 4) + off for off in (0.0, 10.0, -10.0)]
    x = np.concatenate(blobs)
    return x


def test_matches_numpy_reference(spark, data):
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, n_iter=4)
    ref_cents, ref_assign = _ref_kmeans(data.astype(np.float64), 3, 4)
    assert np.allclose(np.array(cents), ref_cents, atol=1e-8)
    got = {r["vec_id"]: r["cluster"]
           for r in kmeans_assign(df, cents).collect()}
    assert got == {i: int(c) for i, c in enumerate(ref_assign)}


def test_separated_blobs_recovered(spark, data):
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(data)],
        "vec_id long, embedding array<double>")
    out = kmeans(df, k=3, n_iter=5).collect()
    by_blob = {}
    for r in out:
        by_blob.setdefault(r["vec_id"] // 40, set()).add(r["cluster"])
    # each blob lands in exactly one cluster, and the clusters differ
    assert all(len(s) == 1 for s in by_blob.values())
    assert len(set().union(*by_blob.values())) == 3


def test_empty_cluster_keeps_centroid(spark):
    # k=3 over 2 distinct points: one cluster stays empty and must
    # retain its initial centroid instead of dividing by zero
    pts = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [5.0, 5.0])]
    df = spark.createDataFrame(pts, "vec_id long, embedding array<double>")
    cents = kmeans_fit(df, k=3, n_iter=3)
    assert len(cents) == 3
    assert all(all(np.isfinite(v) for v in c) for c in cents)
