"""Distributed BPE training (operators/bpe.py) vs a sequential
reference implementation of the classic algorithm."""

from __future__ import annotations

import re
from collections import Counter


def _ref_vocab(texts):
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[\w']+", t.lower()))
    return {w: c for w, c in words.items()}


def _ref_bpe(texts, n_merges):
    """Sequential word-level BPE: greedy left-to-right merge
    application, ties broken by (count desc, a, b)."""
    vocab = {tuple(w): c for w, c in _ref_vocab(texts).items()}
    merges = []
    for rank in range(n_merges):
        pairs = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pairs[(syms[i], syms[i + 1])] += c
        if not pairs:
            break
        (a, b), cnt = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))
        merges.append((rank, a, b, a + b, cnt))
        new = {}
        for syms, c in vocab.items():
            out, prev = [], None
            for s in syms:
                if prev == a and s == b:
                    out.append(a + b)
                    prev = None
                else:
                    if prev is not None:
                        out.append(prev)
                    prev = s
            if prev is not None:
                out.append(prev)
            new[tuple(out)] = new.get(tuple(out), 0) + c
        vocab = new
    return merges


TEXTS = [
    "low lower lowest low low",
    "new newer newest new news",
    "the newer the better the lower",
    "widest wide wider wide",
]


def test_pair_counts_match_reference(spark):
    from apache_beam_spark.operators.bpe import bpe_pair_counts

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = {(r["a"], r["b"]): r["pair_count"]
           for r in bpe_pair_counts(df).collect()}
    want = Counter()
    for w, c in _ref_vocab(TEXTS).items():
        for i in range(len(w) - 1):
            want[(w[i], w[i + 1])] += c
    assert got == dict(want)


def test_train_matches_reference_merges(spark):
    from apache_beam_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = [(r["rank"], r["a"], r["b"], r["merged"], r["pair_count"])
           for r in bpe_train(df, n_merges=8).orderBy("rank").collect()]
    assert got == _ref_bpe(TEXTS, 8)
    # merged symbols compose: later merges may consume earlier ones
    assert any(len(m[3]) > 2 for m in got)


def test_train_stops_when_no_pairs_left(spark):
    from apache_beam_spark.operators.bpe import bpe_train

    df = spark.createDataFrame([(0, "a b a b")], "doc_id long, text string")
    got = bpe_train(df, n_merges=10).collect()
    assert got == []  # single-char words: no adjacent pairs at all


def test_overlapping_merge_is_left_to_right(spark):
    from apache_beam_spark.operators.bpe import bpe_train

    # 'aaaa' under merge (a,a): left-to-right -> [aa, aa], then (aa,aa)
    df = spark.createDataFrame([(0, "aaaa aaaa aaaa")],
                               "doc_id long, text string")
    got = [(r["a"], r["b"]) for r in
           bpe_train(df, n_merges=2).orderBy("rank").collect()]
    want = [(m[1], m[2]) for m in _ref_bpe(["aaaa aaaa aaaa"], 2)]
    assert got == want and got == [("a", "a"), ("aa", "aa")]


def _ref_encode_counts(texts, merges):
    def apply(syms, a, b):
        out, prev = [], None
        for s in syms:
            if prev == a and s == b:
                out.append(a + b)
                prev = None
            else:
                if prev is not None:
                    out.append(prev)
                prev = s
        if prev is not None:
            out.append(prev)
        return out

    counts = []
    for t in texts:
        n = 0
        for w in re.findall(r"[\w']+", t.lower()):
            syms = list(w)
            for a, b in merges:
                syms = apply(syms, a, b)
            n += len(syms)
        counts.append(n)
    return counts


def test_encode_token_counts_match_reference(spark):
    from apache_beam_spark.operators.bpe import bpe_encode_token_counts

    merges = [("t", "h"), ("th", "e"), ("e", "r"), ("a", "a"),
              ("aa", "a"), ("l", "o"), ("lo", "w")]
    texts = TEXTS + ["aaaa aaaaaa the their other", ""]
    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)],
                               "doc_id long, text string")
    got = {r["doc_id"]: r["n_tokens"]
           for r in bpe_encode_token_counts(df, merges).collect()}
    want = _ref_encode_counts(texts, merges)
    assert got == {i: n for i, n in enumerate(want)}
    assert got[len(texts) - 1] == 0  # empty doc -> zero tokens
