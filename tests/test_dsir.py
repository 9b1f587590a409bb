"""DSIR importance resampling (operators/dsir.py) vs a sequential
reference: hashed-feature bucketing, quantized log-ratio weights,
per-document scores, and the deterministic top-frac selection."""

from __future__ import annotations

import hashlib
import math
import re
from collections import Counter

import pytest

from apache_beam_spark.operators.dsir import (
    _W_SCALE,
    dsir_scores,
    dsir_select,
    dsir_weights,
)

RAW = [
    "the cat sat on the mat",
    "dogs chase cats in the park",
    "stock prices fell sharply today",
    "the market rallied on earnings",
    "cats and dogs play in the sun",
    "quarterly earnings beat market expectations",
    "a cat naps on a warm mat",
    "investors sold shares amid market fears",
]
# target domain: finance-flavored docs
TARGET_IDS = {2, 3, 5, 7}
NB = 512


def _bucket(feat: str) -> int:
    return int(hashlib.md5(feat.encode()).hexdigest()[:6], 16) % NB


def _feats(text: str) -> list:
    toks = re.findall(r"[\w']+", text.lower())
    return toks + [f"{a} {b}" for a, b in zip(toks, toks[1:])]


def _ref_weights():
    p, q = Counter(), Counter()
    for i, t in enumerate(RAW):
        for f in _feats(t):
            b = _bucket(f)
            q[b] += 1
            if i in TARGET_IDS:
                p[b] += 1
    pc = {b: p.get(b, 0) + 1 for b in range(NB)}
    qc = {b: q.get(b, 0) + 1 for b in range(NB)}
    P, Q = float(sum(pc.values())), float(sum(qc.values()))
    return {b: round((math.log(pc[b] / P) - math.log(qc[b] / Q))
                     * _W_SCALE) for b in range(NB)}


def _ref_scores():
    w = _ref_weights()
    return {i: sum(w[_bucket(f)] for f in _feats(t))
            for i, t in enumerate(RAW)}


def _frames(spark):
    docs = spark.createDataFrame(list(enumerate(RAW)),
                                 "doc_id long, text string")
    target = docs.where(docs.doc_id.isin(*TARGET_IDS))
    return docs, target


def test_weights_match_reference(spark):
    docs, target = _frames(spark)
    got = {r["bucket"]: r["w"] for r in
           dsir_weights(docs, target, n_buckets=NB).collect()}
    assert got == _ref_weights()
    assert len(got) == NB                 # absent buckets present too


def test_scores_match_reference_and_rank_target_docs_higher(spark):
    docs, target = _frames(spark)
    w = dsir_weights(docs, target, n_buckets=NB)
    got = {r["doc_id"]: r["dsir_score"] for r in
           dsir_scores(docs, w, n_buckets=NB).collect()}
    assert got == _ref_scores()
    # the point of DSIR: target-like docs outscore off-domain ones
    tgt = min(got[i] for i in TARGET_IDS)
    oth = max(got[i] for i in range(len(RAW)) if i not in TARGET_IDS)
    assert tgt > oth


def test_select_keeps_top_frac_deterministically(spark):
    docs, target = _frames(spark)
    w = dsir_weights(docs, target, n_buckets=NB)
    kept = sorted(r["doc_id"] for r in
                  dsir_select(docs, w, frac=0.5, n_buckets=NB).collect())
    ref = sorted(_ref_scores().items(), key=lambda kv: (-kv[1], kv[0]))
    assert kept == sorted(i for i, _ in ref[:4])
    # frac bounds
    assert dsir_select(docs, w, frac=0.01, n_buckets=NB).count() == 1
    with pytest.raises(ValueError, match="frac"):
        dsir_select(docs, w, frac=0.0)


def test_empty_doc_scores_zero(spark):
    docs = spark.createDataFrame(
        [(0, "market earnings"), (1, "cats chase dogs"), (2, "")],
        "doc_id long, text string")
    w = dsir_weights(docs, docs.where(docs.doc_id == 0), n_buckets=NB)
    got = {r["doc_id"]: r["dsir_score"] for r in
           dsir_scores(docs, w, n_buckets=NB).collect()}
    assert got[2] == 0 and got[0] > got[1]
