"""Product quantization (similarity/pq.py) vs a numpy reference.

`embed_pq_fixed` value-oracles the encode+ADC pipeline in SQL; these
tests pin the distributed pieces against in-process numpy on collected
data — encode codes, exact ADC top-k reproduction, and a recall sanity
check for the trained path.
"""

from __future__ import annotations

import numpy as np
import pytest

from tests.conftest import SF_DIR

M, KSUB, D = 8, 16, 64
DSUB = D // M


@pytest.fixture(scope="module")
def emb(spark):
    from apache_beam_spark.sources.tables import load_table

    df = load_table(spark, "embeddings", SF_DIR)
    rows = df.orderBy("vec_id").collect()
    ids = np.array([r["vec_id"] for r in rows])
    x = np.array([r["embedding"] for r in rows], dtype=np.float64)
    return df, ids, x


@pytest.fixture(scope="module")
def fixed_books(emb):
    _, ids, x = emb
    first = x[np.argsort(ids)[:KSUB]]
    return [[list(map(float, v[s * DSUB:(s + 1) * DSUB])) for v in first]
            for s in range(M)]


def _ref_codes(x, books):
    cb = np.asarray(books)
    codes = np.empty((x.shape[0], M), dtype=np.int64)
    for s in range(M):
        xs = x[:, s * DSUB:(s + 1) * DSUB]
        codes[:, s] = ((xs[:, None, :] - cb[s][None, :, :]) ** 2) \
            .sum(-1).argmin(1)
    return codes


def test_encode_matches_numpy(emb, fixed_books):
    from apache_beam_spark.similarity.pq import pq_encode

    df, ids, x = emb
    got = {r["vec_id"]: r["codes"]
           for r in pq_encode(df, fixed_books).collect()}
    ref = _ref_codes(x, fixed_books)
    for i, vid in enumerate(ids):
        assert list(got[vid]) == list(ref[i])
        assert len(got[vid]) == M          # m codes = the 32x compression


def test_adc_topk_matches_numpy(emb, fixed_books):
    from apache_beam_spark.similarity.pq import pq_topk

    df, ids, x = emb
    nq = min(20, len(ids))
    q = df.filter(df.vec_id < nq)
    out = pq_topk(q, df, fixed_books, k=3).collect()

    cb = np.asarray(fixed_books)
    codes = _ref_codes(x, fixed_books)
    recon = np.concatenate([cb[s][codes[:, s]] for s in range(M)], axis=1)
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qi in range(nq):
        d = ((x[qi][None, :] - recon) ** 2).sum(-1)
        d[ids == qi] = np.inf              # self-exclude
        order = np.lexsort((ids, d))[:3]
        got = sorted(by_q[qi], key=lambda r: r["rank"])
        assert [r["neighbor_id"] for r in got] == [ids[o] for o in order]
        np.testing.assert_allclose([r["adc"] for r in got], d[order],
                                   rtol=1e-9)


def test_trained_recall_sanity(emb):
    """Trained codebooks (seeded sample k-means) must place at least
    the nearest true neighbor inside compressed top-3 for most
    queries — a loose, deterministic floor (everything is seeded)."""
    from apache_beam_spark.similarity.pq import pq_train, pq_topk

    df, ids, x = emb
    books = pq_train(df, dim=D, m=M, ksub=KSUB)
    nq = min(20, len(ids))
    out = pq_topk(df.filter(df.vec_id < nq), df, books, k=3).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    hits = 0
    for qi in range(nq):
        d = ((x[qi][None, :] - x) ** 2).sum(-1)
        d[ids == qi] = np.inf
        if ids[np.argmin(d)] in by_q[qi]:
            hits += 1
    assert hits >= nq // 3


def test_boundary_ties_take_lowest_ids(spark):
    """Exact ADC ties on the k-th boundary must resolve to the LOWEST
    neighbor ids (the determinism contract): 10 identical vectors all
    tie at distance 0, so top-3 is ids 1,2,3 regardless of batch or
    partition order (ADVICE r6: argpartition used to cut ties
    arbitrarily before the id-tiebreak window ran)."""
    from apache_beam_spark.similarity.pq import pq_topk

    v = [float(i % 7) for i in range(D)]
    # descending insertion order so a naive "first seen wins" fails too
    df = spark.createDataFrame(
        [(i, v) for i in range(10, 0, -1)],
        "vec_id bigint, embedding array<double>").repartition(4)
    books = [[v[s * DSUB:(s + 1) * DSUB]] + [
        [x + 50.0 for x in v[s * DSUB:(s + 1) * DSUB]]] for s in range(M)]
    q = spark.createDataFrame([(0, v)],
                              "vec_id bigint, embedding array<double>")
    out = pq_topk(q, df, books, k=3, self_exclude=False).collect()
    got = [r["neighbor_id"] for r in sorted(out, key=lambda r: r["rank"])]
    assert got == [1, 2, 3]
    assert all(r["adc"] == 0.0 for r in out)


@pytest.fixture(scope="module")
def fixed_cents(emb):
    _, ids, x = emb
    return [list(map(float, v)) for v in x[np.argsort(ids)[:8]]]


def _ref_ivfpq(x, ids, cents, books, nq, k=3, n_probe=2):
    """Driver-side mirror of ivfpq_encode + ivfpq_topk."""
    cent = np.asarray(cents)
    cb = np.asarray(books)
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cell = d2.argmin(1)
    res = x - cent[cell]
    codes = np.empty((len(x), M), dtype=np.int64)
    for s in range(M):
        rs = res[:, s * DSUB:(s + 1) * DSUB]
        codes[:, s] = ((rs[:, None, :] - cb[s][None, :, :]) ** 2) \
            .sum(-1).argmin(1)
    recon = cent[cell] + np.concatenate(
        [cb[s][codes[:, s]] for s in range(M)], axis=1)
    out = {}
    for qi in range(nq):
        probes = np.argsort(d2[qi], kind="stable")[:n_probe]
        mask = np.isin(cell, probes) & (ids != qi)
        d = ((x[qi][None, :] - recon) ** 2).sum(-1)
        d[~mask] = np.inf
        order = np.lexsort((ids, d))[:k]
        order = [o for o in order if np.isfinite(d[o])]
        out[qi] = ([ids[o] for o in order], [d[o] for o in order])
    return out


def test_ivfpq_matches_numpy(emb, fixed_cents, fixed_books):
    from apache_beam_spark.similarity.pq import ivfpq_topk

    df, ids, x = emb
    nq = min(20, len(ids))
    got = {}
    for r in ivfpq_topk(df.filter(df.vec_id < nq), df, fixed_cents,
                        fixed_books, k=3, n_probe=2).collect():
        got.setdefault(r["query_id"], []).append(r)
    ref = _ref_ivfpq(x, ids, fixed_cents, fixed_books, nq)
    for qi in range(nq):
        rows = sorted(got.get(qi, []), key=lambda r: r["rank"])
        want_ids, want_d = ref[qi]
        assert [r["neighbor_id"] for r in rows] == list(want_ids)
        np.testing.assert_allclose([r["adc"] for r in rows], want_d,
                                   rtol=1e-9)


def test_ivfpq_encode_residual_codes(emb, fixed_cents, fixed_books):
    from apache_beam_spark.similarity.pq import ivfpq_encode

    df, ids, x = emb
    cent = np.asarray(fixed_cents)
    cb = np.asarray(fixed_books)
    d2 = ((x[:, None, :] - cent[None, :, :]) ** 2).sum(-1)
    cell = d2.argmin(1)
    res = x - cent[cell]
    got = {r["vec_id"]: (r["cell"], list(r["codes"]))
           for r in ivfpq_encode(df, fixed_cents, fixed_books).collect()}
    for i, vid in enumerate(ids):
        want = [int(((res[i, s * DSUB:(s + 1) * DSUB] - cb[s]) ** 2)
                    .sum(-1).argmin()) for s in range(M)]
        assert got[vid] == (cell[i], want)


def test_ivfpq_recall_floor_vs_flat_pq(emb):
    """Trained IVF-PQ (n_probe=4 of 8 cells) must keep at least 60% of
    flat trained PQ's true-nearest-neighbor recall — the price of
    scanning ~half the code rows is bounded, and everything is seeded
    so the floor is deterministic."""
    from apache_beam_spark.similarity.knn import _kmeans
    from apache_beam_spark.similarity.pq import (ivfpq_topk, pq_topk,
                                                 pq_train)

    df, ids, x = emb
    books = pq_train(df, dim=D, m=M, ksub=KSUB)
    cents = [list(map(float, c)) for c in _kmeans(x, 8)]
    nq = min(20, len(ids))
    q = df.filter(df.vec_id < nq)

    def hits(rows):
        by_q = {}
        for r in rows:
            by_q.setdefault(r["query_id"], set()).add(r["neighbor_id"])
        n = 0
        for qi in range(nq):
            d = ((x[qi][None, :] - x) ** 2).sum(-1)
            d[ids == qi] = np.inf
            if ids[np.argmin(d)] in by_q.get(qi, set()):
                n += 1
        return n

    flat = hits(pq_topk(q, df, books, k=3).collect())
    ivf = hits(ivfpq_topk(q, df, cents, books, k=3, n_probe=4).collect())
    assert flat > 0
    assert ivf >= max(1, int(0.6 * flat))
