"""Distributed PCA (similarity/pca.py) vs a numpy reference.

The covariance query is SQL-oracled (`embed_pca_gram`); these tests
pin the non-SQL-expressible half — the eigendecomposition, sign
canonicalization, and gemm projection — against numpy on collected
data, plus the trace invariant tying eigenvalues back to the oracled
covariance.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def emb(spark):
    from apache_beam_spark.sources.tables import load_table

    df = load_table(spark, "embeddings", SF_DIR)
    x = np.array([r["embedding"] for r in
                  df.orderBy("vec_id").collect()], dtype=np.float64)
    ids = np.array([r["vec_id"] for r in df.orderBy("vec_id").collect()])
    return df, ids, x


def _ref_model(x: np.ndarray, k: int):
    mean = x.mean(axis=0)
    cov = np.cov(x, rowvar=False, ddof=0)
    vals, vecs = np.linalg.eigh(cov)
    order = np.argsort(vals)[::-1][:k]
    comps = vecs[:, order].T
    for row in comps:
        if row[np.argmax(np.abs(row))] < 0:
            row *= -1.0
    return mean, comps, vals[order]


def test_moments_match_numpy(emb):
    from apache_beam_spark.similarity.pca import embedding_moments

    df, _, x = emb
    n, mean, scatter = embedding_moments(df)
    assert n == x.shape[0]
    np.testing.assert_allclose(mean, x.mean(axis=0), atol=1e-10)
    np.testing.assert_allclose(scatter, x.T @ x, rtol=1e-12)


def test_fit_matches_numpy_eigh(emb):
    from apache_beam_spark.similarity.pca import pca_fit

    df, _, x = emb
    model = pca_fit(df, k=6)
    mean, comps, vals = _ref_model(x, 6)
    np.testing.assert_allclose(model.mean, mean, atol=1e-10)
    np.testing.assert_allclose(model.explained_variance, vals, rtol=1e-8)
    np.testing.assert_allclose(model.components, comps, atol=1e-8)
    # variance-descending, and components orthonormal
    ev = model.explained_variance
    assert all(a >= b for a, b in zip(ev, ev[1:]))
    c = np.asarray(model.components)
    np.testing.assert_allclose(c @ c.T, np.eye(6), atol=1e-10)


def test_trace_invariant(emb):
    """Sum of ALL eigenvalues == trace of the (oracled) covariance —
    ties the no-oracle eigh half to the value-checked matrix."""
    from apache_beam_spark.similarity.pca import covariance_long, pca_fit

    df, _, x = emb
    d = x.shape[1]
    model = pca_fit(df, k=d)
    cov = covariance_long(df).toPandas()
    trace = cov[cov.i == cov.j]["cov"].sum()
    assert abs(sum(model.explained_variance) - trace) < 1e-8 * max(trace, 1)


def test_projection_matches_numpy(emb):
    from apache_beam_spark.similarity.pca import pca_fit, pca_project

    df, ids, x = emb
    model = pca_fit(df, k=4)
    mean, comps, _ = _ref_model(x, 4)
    ref = (x - mean) @ comps.T

    wide = {r["vec_id"]: r["proj"]
            for r in pca_project(df, model).collect()}
    got = np.array([wide[i] for i in ids])
    np.testing.assert_allclose(got, ref, atol=1e-8)

    long = pca_project(df, model, long_form=True).toPandas()
    assert len(long) == len(ids) * 4
    piv = long.pivot(index="vec_id", columns="comp", values="value")
    np.testing.assert_allclose(piv.loc[ids].to_numpy(), ref, atol=1e-8)
