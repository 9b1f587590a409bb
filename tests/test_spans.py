"""Duplicate-substring scrubbing (dedup/spans.py) vs a sequential
reference implementation."""

from __future__ import annotations

import re


def _ref_scrub(texts, L):
    toks = [re.findall(r"[\w']+", t.lower()) for t in texts]
    occ = {}
    for d, ws in enumerate(toks):
        for p in range(len(ws) - L + 1):
            occ.setdefault(tuple(ws[p:p + L]), []).append((d, p))
    flagged = set()
    for starts in occ.values():
        if len(starts) > 1:
            keeper = min(starts)
            flagged |= {s for s in starts if s != keeper}
    out = []
    for d, ws in enumerate(toks):
        rm = [0] * len(ws)
        for (fd, fp) in flagged:
            if fd == d:
                for i in range(fp, min(fp + L, len(ws))):
                    rm[i] = 1
        clean = " ".join(w for w, r in zip(ws, rm) if not r)
        out.append((d, clean, len(ws), sum(rm)))
    return out


S = "alpha bravo charlie delta echo foxtrot golf hotel"  # 8-word span
TEXTS = [
    "intro one two three " + S + " outro four five",
    "different lead in words " + S + " and a different tail",
    "intro one two three " + S + " outro four five",   # exact copy of 0
    S + " filler xx yy zz ww vv uu tt ss " + S,        # within-doc repeat
    "wholly unrelated short text",
    "",
]


def test_scrub_matches_reference(spark):
    from apache_beam_spark.dedup.spans import dup_span_scrub

    df = spark.createDataFrame([(i, t) for i, t in enumerate(TEXTS)],
                               "doc_id long, text string")
    got = sorted(
        (r["doc_id"], r["clean_text"], r["n_tokens"], r["n_removed"])
        for r in dup_span_scrub(df, min_len=5).collect())
    want = sorted(_ref_scrub(TEXTS, 5))
    assert got == want
    by_id = {g[0]: g for g in got}
    assert by_id[0][3] == 0                 # first occurrences survive
    assert by_id[2][1] == "" and by_id[2][3] == by_id[2][2]  # full copy
    assert 0 < by_id[1][3] < by_id[1][2]    # shared span scrubbed
    assert 0 < by_id[3][3] < by_id[3][2]    # within-doc repeat scrubbed
    assert by_id[5] == (5, "", 0, 0)        # empty doc round-trips


def test_short_docs_untouched(spark):
    from apache_beam_spark.dedup.spans import dup_span_scrub

    # identical docs SHORTER than min_len: no gram exists, nothing is
    # scrubbed (this operator is span-level; whole-doc dedup is
    # dedup/exact.py's job)
    df = spark.createDataFrame(
        [(0, "tiny twin text"), (1, "tiny twin text")],
        "doc_id long, text string")
    got = {r["doc_id"]: (r["clean_text"], r["n_removed"])
           for r in dup_span_scrub(df, min_len=5).collect()}
    assert got == {0: ("tiny twin text", 0), 1: ("tiny twin text", 0)}
