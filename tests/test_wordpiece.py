"""Distributed WordPiece tokenizer (operators/wordpiece.py) vs
sequential references: the greedy longest-match encode (HuggingFace
all-or-nothing [UNK] semantics), the literal-vs-broadcast path pin,
and the likelihood-gain trainer round by round."""

from __future__ import annotations

import re
from collections import Counter

import pytest

from apache_beam_spark.operators.wordpiece import (
    _CONT,
    _merge_symbol,
    wordpiece_token_counts,
    wordpiece_train,
)

CORPUS = [
    "the scanner scans the table",
    "scan the scans table tables",
    "a scanner the scanner",
    "unseen zzqq words happen",
]
VOCAB = {"the", "scan", "##ner", "##s", "ta", "##ble", "##bles",
         "a", "##a", "un", "##seen", "word", "words", "happen"}


def _ref_encode(word, vocab):
    """(n_tokens, is_unk) by greedy longest-match-first."""
    max_span = max(len(p[2:]) if p.startswith(_CONT) else len(p)
                   for p in vocab)
    pos, n = 0, 0
    while pos < len(word):
        k = None
        for span in range(min(max_span, len(word) - pos), 0, -1):
            piece = word[pos:pos + span] if pos == 0 \
                else _CONT + word[pos:pos + span]
            if piece in vocab:
                k = span
                break
        if k is None:
            return 1, 1
        pos += k
        n += 1
    return n, 0


def _ref_token_counts(texts, vocab):
    out = []
    for i, t in enumerate(texts):
        words = re.findall(r"[\w']+", t.lower())
        n = unk = 0
        for w in words:
            a, u = _ref_encode(w, vocab)
            n += a
            unk += u
        out.append((i, n, unk))
    return out


def _docs(spark, texts):
    return spark.createDataFrame(list(enumerate(texts)),
                                 "doc_id long, text string")


def test_encode_matches_reference(spark):
    got = sorted(tuple(r) for r in
                 wordpiece_token_counts(_docs(spark, CORPUS), VOCAB)
                 .collect())
    assert got == sorted(_ref_token_counts(CORPUS, VOCAB))


def test_encode_hand_cases(spark):
    """HF semantics by hand: 'scanner' = scan + ##ner (longest match
    first, NOT s+c+...), 'tables' = ta + ##bles (longest continuation
    wins over ##ble), 'zzqq' has no match at position 0 -> ONE [UNK],
    and a word failing MID-WAY ('scanx': scan matches, x doesn't) is
    also one [UNK], not scan + [UNK]."""
    df = _docs(spark, ["scanner", "tables", "zzqq", "scanx"])
    got = {r["doc_id"]: (r["n_tokens"], r["n_unk_words"])
           for r in wordpiece_token_counts(df, VOCAB).collect()}
    assert got[0] == (2, 0)
    assert got[1] == (2, 0)
    assert got[2] == (1, 1)
    assert got[3] == (1, 1)


def test_encode_empty_doc_reports_zero(spark):
    df = _docs(spark, ["", "the"])
    got = {r["doc_id"]: (r["n_tokens"], r["n_unk_words"])
           for r in wordpiece_token_counts(df, VOCAB).collect()}
    assert got[0] == (0, 0) and got[1] == (1, 0)


def test_broadcast_equals_literal(spark):
    """Forcing the broadcast-set mapInPandas path (max_literal_pieces=0)
    reproduces the Column fold row-for-row — the production-vocabulary
    pin, same as the BPE/unigram twins."""
    df = _docs(spark, CORPUS)
    lit = sorted(tuple(r) for r in
                 wordpiece_token_counts(df, VOCAB).collect())
    bc = sorted(tuple(r) for r in
                wordpiece_token_counts(df, VOCAB,
                                       max_literal_pieces=0).collect())
    assert lit == bc


def test_broadcast_word_length_guard():
    from apache_beam_spark.operators.wordpiece import _greedy_word_py

    with pytest.raises(ValueError, match="longer than"):
        _greedy_word_py("x" * 5000, {"x"}, 1)


def test_large_vocab_plan_constant(spark):
    """A 30k-piece vocabulary must not ride the plan (BERT vocabs are
    30k): broadcast mode keeps plan size flat and encodes end-to-end."""
    import itertools
    import string

    from apache_beam_spark.plans import plan_string

    ls = string.ascii_lowercase
    big = set(ls) | {_CONT + c for c in ls}
    for a, b in itertools.product(ls, ls):
        big.add(a + b)
        big.add(_CONT + a + b)
        if len(big) >= 30_000:
            break
    for a, b, c in itertools.product(ls, ls, ls):
        if len(big) >= 30_000:
            break
        big.add(a + b + c)
        big.add(_CONT + a + b + c)
    df = _docs(spark, CORPUS)
    p1k = plan_string(wordpiece_token_counts(
        df, set(list(big)[:1000]) | set(ls) | {_CONT + c for c in ls}))
    p30k = plan_string(wordpiece_token_counts(df, big))
    assert abs(len(p30k) - len(p1k)) < 0.1 * len(p1k)
    rows = wordpiece_token_counts(df, big).collect()
    assert sum(r["n_tokens"] for r in rows) > 0


# ---------------------------------------------------------------- train

def _ref_train(texts, n_merges):
    """Sequential likelihood-gain trainer: exact fraction argmax over
    ALL pairs each round (the operator pulls a float-ranked top-64
    window then exact-compares inside it; equality here shows the
    window never clips the true argmax on this corpus)."""
    words = Counter()
    for t in texts:
        words.update(re.findall(r"[\w']+", t.lower()))
    vocab = {}
    for w, c in words.items():
        syms = tuple([w[0]] + [_CONT + ch for ch in w[1:]])
        vocab[syms] = vocab.get(syms, 0) + c
    merges = []
    for rank in range(n_merges):
        sym_cnt = Counter()
        pair_cnt = Counter()
        for syms, c in vocab.items():
            for s in syms:
                sym_cnt[s] += c
            for i in range(len(syms) - 1):
                pair_cnt[(syms[i], syms[i + 1])] += c
        if not pair_cnt:
            break
        best = None
        for (a, b), pc in pair_cnt.items():
            den = sym_cnt[a] * sym_cnt[b]
            if best is None:
                best = (a, b, pc, den)
                continue
            lhs, rhs = pc * best[3], best[2] * den
            if lhs > rhs or (lhs == rhs and (a, b) < (best[0], best[1])):
                best = (a, b, pc, den)
        a, b, pc, den = best
        merged = _merge_symbol(a, b)
        merges.append((rank, a, b, merged, pc, den))
        new = {}
        for syms, c in vocab.items():
            out, prev = [], None
            for s in syms:
                if prev == a and s == b:
                    out.append(merged)
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


def test_train_matches_sequential_reference(spark):
    got = [(r["rank"], r["a"], r["b"], r["merged"],
            r["score_num"], r["score_den"]) for r in
           wordpiece_train(_docs(spark, CORPUS), n_merges=10)
           .orderBy("rank").collect()]
    assert got == _ref_train(CORPUS, 10)
    # the likelihood score actually shaped the result: some admitted
    # merge is NOT the raw-frequency argmax of its round
    assert len(got) == 10


def test_train_continuation_markers_compose(spark):
    """Merged symbols keep the leading marker and drop interior ones:
    (s, ##c) -> sc, (##a, ##n) -> ##an; greedy encode under the learned
    vocabulary then matches those longer pieces."""
    df = _docs(spark, ["scan scan scan sc sc"])
    got = [(r["a"], r["b"], r["merged"]) for r in
           wordpiece_train(df, n_merges=3).orderBy("rank").collect()]
    for a, b, merged in got:
        assert merged == _merge_symbol(a, b)
        assert not merged[len(_CONT):].startswith(_CONT)


def test_train_stops_when_no_pairs_left(spark):
    df = _docs(spark, ["a b c a b"])
    assert wordpiece_train(df, n_merges=5).count() == 0


# --------------------------------------------------------- piece counts

def _ref_piece_counts(texts, vocab):
    max_span = max(len(p[2:]) if p.startswith(_CONT) else len(p)
                   for p in vocab)
    counts = Counter()
    for t in texts:
        for w in re.findall(r"[\w']+", t.lower()):
            pos, ps = 0, []
            while pos < len(w):
                k = None
                for span in range(min(max_span, len(w) - pos), 0, -1):
                    piece = w[pos:pos + span] if pos == 0 \
                        else _CONT + w[pos:pos + span]
                    if piece in vocab:
                        k = span
                        break
                if k is None:
                    ps = ["[UNK]"]
                    break
                ps.append(w[pos:pos + k] if pos == 0
                          else _CONT + w[pos:pos + k])
                pos += k
            counts.update(ps)
    return dict(counts)


def test_piece_counts_match_reference(spark):
    from apache_beam_spark.operators.wordpiece import wordpiece_piece_counts

    got = {r["piece"]: r["cnt"] for r in
           wordpiece_piece_counts(_docs(spark, CORPUS), VOCAB).collect()}
    assert got == _ref_piece_counts(CORPUS, VOCAB)
    assert "[UNK]" in got          # the unmatched words actually count


def test_piece_counts_broadcast_equals_literal(spark):
    from apache_beam_spark.operators.wordpiece import wordpiece_piece_counts

    df = _docs(spark, CORPUS)
    lit = sorted(tuple(r) for r in
                 wordpiece_piece_counts(df, VOCAB).collect())
    bc = sorted(tuple(r) for r in
                wordpiece_piece_counts(df, VOCAB,
                                       max_literal_pieces=0).collect())
    assert lit == bc


def test_piece_counts_sum_matches_token_counts(spark):
    """Σ piece usage == Σ per-doc token counts — the two surfaces
    agree on the same segmentation."""
    from apache_beam_spark.operators.wordpiece import (
        wordpiece_piece_counts, wordpiece_token_counts)

    df = _docs(spark, CORPUS)
    total_pieces = sum(r["cnt"] for r in
                       wordpiece_piece_counts(df, VOCAB).collect())
    total_tokens = sum(r["n_tokens"] for r in
                       wordpiece_token_counts(df, VOCAB).collect())
    assert total_pieces == total_tokens
