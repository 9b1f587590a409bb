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
