"""Property-based invariants for the round-3 operators."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=300, deadline=None)
@given(st.integers(min_value=0, max_value=500),
       st.integers(min_value=2, max_value=60),
       st.integers(min_value=0, max_value=30))
def test_sliding_chunk_starts_cover_and_overlap(n, chunk, overlap):
    """Pure-python mirror of sliding_chunks' start/count formula:
    chunks cover every token, consecutive chunks overlap exactly
    ``overlap`` (except a short tail), counts match the Column expr."""
    if overlap >= chunk:
        return
    import math

    step = chunk - overlap
    n_chunks = max(math.ceil((n - overlap) / step), 1)
    starts = list(range(0, n_chunks * step, step))
    assert len(starts) == n_chunks
    # coverage: the last chunk reaches the end
    assert starts[-1] + chunk >= n
    # no useless chunk fully inside the previous one
    for a, b in zip(starts, starts[1:]):
        assert b > a and b <= a + chunk
    # all but possibly the last start strictly inside the text
    if n > 0:
        assert all(s < n for s in starts[:-1] + ([starts[-1]] if n > overlap else []))


def _z_interleave(vals, bits):
    z = 0
    for j, v in enumerate(vals):
        for i in range(bits):
            z |= ((v >> i) & 1) << (i * len(vals) + j)
    return z


@settings(max_examples=300, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=(1 << 16) - 1),
                min_size=2, max_size=3),
       st.integers(min_value=1, max_value=16))
def test_zvalue_bijective_and_monotone_per_axis(vals, bits):
    """Morton code invariants: round-trippable (bijective on the
    masked coords) and monotone along each axis with the others
    fixed."""
    k = len(vals)
    if k * bits > 63:
        return
    masked = [v & ((1 << bits) - 1) for v in vals]
    z = _z_interleave(masked, bits)
    # decode back
    dec = [0] * k
    for j in range(k):
        for i in range(bits):
            dec[j] |= ((z >> (i * k + j)) & 1) << i
    assert dec == masked
    # monotone: bumping one masked coordinate strictly increases z
    for j in range(k):
        if masked[j] + 1 < (1 << bits):
            bumped = list(masked)
            bumped[j] += 1
            assert _z_interleave(bumped, bits) > z


@settings(max_examples=200, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 5), st.integers(0, 100),
                          st.booleans()), min_size=1, max_size=40))
def test_rate_limit_reference_model(events):
    """Pure-python token bucket == the documented contract: per (key,
    window) at most MAX admitted, in (ts, id) order."""
    MAX, WIN = 3, 10
    rows = [{"key": k, "ts": t, "id": i, "del": d}
            for i, (k, t, d) in enumerate(events)]
    admitted = []
    bucket = {}
    for r in sorted(rows, key=lambda r: (r["key"], r["ts"], r["id"])):
        w = r["ts"] // WIN * WIN
        c = bucket.get((r["key"], w), 0)
        if c < MAX:
            bucket[(r["key"], w)] = c + 1
            admitted.append((r["key"], r["id"], c + 1))
    # invariants: per (key, window) <= MAX; seq dense from 1
    from collections import defaultdict

    per = defaultdict(list)
    for k, i, s in admitted:
        w = next(r["ts"] for r in rows if r["id"] == i) // WIN * WIN
        per[(k, w)].append(s)
    for seqs in per.values():
        assert sorted(seqs) == list(range(1, len(seqs) + 1))
        assert len(seqs) <= MAX


def test_pagerank_hand_example(spark):
    """3-node chain a->b->c (+ reverse edges = path graph): symmetric
    ends must tie, middle ranks highest; values match a numpy power
    iteration of the same simplified model."""
    import numpy as np
    from pyspark.sql import functions as F  # noqa: F401

    from apache_beam_spark.operators.graph import pagerank

    pairs = [("a", "b"), ("b", "a"), ("b", "c"), ("c", "b")]
    edges = spark.createDataFrame(pairs, "src string, dst string")
    got = {r["node"]: r["rank"] for r in pagerank(edges, iters=5).collect()}

    nodes = ["a", "b", "c"]
    deg = {"a": 1, "b": 2, "c": 1}
    r = {n: 1 / 3 for n in nodes}
    for _ in range(5):
        contrib = {n: 0.0 for n in nodes}
        for s, d in pairs:
            contrib[d] += r[s] / deg[s]
        r = {n: 0.15 / 3 + 0.85 * contrib[n] for n in nodes}
    assert got == {n: round(r[n], 6) for n in nodes}
    assert got["a"] == got["c"] and got["b"] > got["a"]


def test_pagerank_empty_edges_fails_loudly(spark):
    import pytest as _pytest

    from apache_beam_spark.operators.graph import pagerank

    empty = spark.createDataFrame([], "src string, dst string")
    with _pytest.raises(ValueError, match="empty edge list"):
        pagerank(empty)
