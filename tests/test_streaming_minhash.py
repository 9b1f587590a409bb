"""Streaming MinHash near-dup dedup (streaming/stateful.py): the
first-arrival bucket rule must match the batch-computed expectation on
an ordered replay, with watermark-evicted state."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from apache_beam_spark.streaming.sources import TestStream, read_bounded
from apache_beam_spark.streaming.stateful import streaming_minhash_dedup

SCHEMA = "doc_id bigint, ts bigint, text string"
M = 60_000_000  # one minute in µs
BASE = 24 * 60 * M
KW = dict(num_hashes=32, num_bands=8, shingle_k=3, seed=7)

A = "the quick brown fox jumps over the lazy dog again and again today"
B = "pack my box with five dozen liquor jugs before the long winter"
C = "completely unrelated text about spark shuffles and parquet readers"


def _doc(i, minutes, text):
    return {"doc_id": i, "ts": BASE + minutes * M, "text": text}


def _expected_first_arrival(spark, batches):
    """Batch-side oracle: keep a doc iff it is the first arrival (by
    micro-batch index) in EVERY band bucket it occupies.  Also sanity-
    checks the test data: no two docs of the SAME batch may share a
    bucket, or arrival order there would be ambiguous."""
    from apache_beam_spark.dedup.minhash import _band_rows, minhash_signature

    rows = [(bi, d["doc_id"], d["text"])
            for bi, batch in enumerate(batches) for d in batch]
    df = spark.createDataFrame([(d, t) for _, d, t in rows],
                               "doc_id long, text string")
    r = KW["num_hashes"] // KW["num_bands"]
    got = (df.select(
        "doc_id",
        minhash_signature(F.col("text"), KW["num_hashes"], KW["shingle_k"],
                          KW["seed"]).alias("s"))
        .select("doc_id", F.explode(
            _band_rows("s", KW["num_bands"], r)).alias("b"))
        .select("doc_id", "b.band", "b.bh").collect())
    batch_of = {d: bi for bi, d, _ in rows}
    buckets: dict[tuple, list[int]] = {}
    for row in got:
        buckets.setdefault((row["band"], row["bh"]), []).append(row["doc_id"])
    kept = {d for _, d, _ in rows}
    for members in buckets.values():
        bis = [batch_of[d] for d in members]
        assert len(set(bis)) == len(bis), \
            "test data invalid: same-batch docs share a bucket"
        first = min(members, key=lambda d: batch_of[d])
        kept -= {d for d in members if d != first}
    return kept


def test_stream_matches_first_arrival_rule(spark):
    batches = [
        [_doc(1, 0, A), _doc(2, 1, B)],
        # exact copy of A -> collides in every bucket -> dropped;
        # novel doc -> kept
        [_doc(3, 2, A), _doc(4, 3, C)],
        # near-dup of A (one word changed) -> shares >= 1 bucket
        [_doc(5, 4, A.replace("today", "tonight"))],
        # watermark-advancing tails: doc 99 closes doc 98's window;
        # 99's own window stays open, so 99 never appears
        [_doc(98, 60, "tail one filler words entirely distinct")],
        [_doc(99, 120, "tail two other filler words entirely distinct")],
    ]
    want = _expected_first_arrival(spark, batches[:3])
    assert 1 in want and 2 in want and 4 in want and 3 not in want
    ts = TestStream(tempfile.mkdtemp(prefix="sminhash_"))
    for b in batches:
        ts.add_elements(b)
    sdf = streaming_minhash_dedup(
        ts.stream(spark, SCHEMA), within="10 minutes", **KW)
    got = {r["doc_id"] for r in read_bounded(sdf).collect()}
    assert got - {98} == want and 99 not in got


def test_duplicate_after_eviction_is_kept_again(spark):
    """Once the watermark passes the horizon, bucket state evicts — a
    re-arrival of the same text far later is FIRST again (the bounded-
    state contract: the horizon, not the corpus, sizes the state)."""
    batches = [
        [_doc(1, 0, A)],
        [_doc(2, 60, B)],           # advances watermark past 0+10min
        # state eviction lags one micro-batch in Spark (the eviction
        # pass runs with the PREVIOUS batch's watermark) — this filler
        # batch is where doc 1's expired buckets actually drop
        [_doc(4, 90, C)],
        [_doc(3, 120, A)],          # same text, state long evicted
        [_doc(98, 300, "tail filler words entirely distinct")],
        [_doc(99, 360, "tail other filler words entirely distinct")],
    ]
    ts = TestStream(tempfile.mkdtemp(prefix="sminhash2_"))
    for b in batches:
        ts.add_elements(b)
    sdf = streaming_minhash_dedup(
        ts.stream(spark, SCHEMA), within="10 minutes", **KW)
    got = {r["doc_id"] for r in read_bounded(sdf).collect()}
    assert {1, 3} <= got and 2 in got
