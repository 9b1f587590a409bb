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


def test_md5_column_helpers_match_batch_formulation(spark):
    """minhash_signature_md5/_band_rows_md5 (the stateless Column twins
    the streaming md5 path uses) must produce the exact (id, band, bh)
    set of minhash_dedup_md5's explode/groupBy formulation — the frame
    the DuckDB oracle reproduces."""
    from apache_beam_spark.dedup.minhash import (_band_rows_md5,
                                                 minhash_signature_md5)
    from apache_beam_spark.functions.text import shingles

    nh, nb, r, k = 32, 8, 4, 3
    df = spark.createDataFrame(
        [(1, A), (2, B), (3, C), (4, A + " extra")],
        "doc_id long, text string")
    col = (df.select("doc_id",
                     minhash_signature_md5(F.col("text"), nh, k).alias("s"))
           .select("doc_id", F.explode(_band_rows_md5("s", nb, r)).alias("b"))
           .select("doc_id", "b.band", "b.bh"))
    got = {(x["doc_id"], x["band"], x["bh"]) for x in col.collect()}
    sh = df.select(
        F.col("doc_id").alias("id"),
        F.explode(F.array_distinct(shingles(F.col("text"), k))).alias("s"))
    hx = (sh.select("id", "s",
                    F.explode(F.sequence(F.lit(0), F.lit(nh - 1))).alias("i"))
          .select("id", "i",
                  F.substring(F.md5(F.encode(
                      F.concat_ws(":", "s", "i"), "UTF-8")), 1, 16).alias("h"))
          .groupBy("id", "i").agg(F.min("h").alias("h")))
    bands = (hx.groupBy("id", F.expr(f"i div {r}").alias("band"))
             .agg(F.md5(F.encode(F.concat_ws("", F.transform(
                 F.array_sort(F.collect_list(F.struct("i", "h"))),
                 lambda x: x["h"])), "UTF-8")).alias("bh")))
    want = {(x["id"], x["band"], x["bh"]) for x in bands.collect()}
    assert got == want and len(got) == 4 * nb


def test_entry_waves_are_bucket_disjoint(spark):
    """Determinism precondition of the stream_minhash_dedup entry
    query: no two docs of the SAME wave share a band bucket (in-batch
    first-arrival would otherwise be ambiguous).  Checked at the test
    SF and the driver's sf0.01 gate."""
    from apache_beam_spark.dedup.minhash import (_band_rows_md5,
                                                 minhash_signature_md5)

    for sf_dir in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        d40 = (spark.read.parquet(f"{sf_dir}/documents.parquet")
               .filter(F.col("doc_id") < 40).select("doc_id", "text"))
        # the entry's deterministic exclusion: any base doc sharing a
        # band bucket with another base doc is dropped (the corpus
        # plants near-dups — 8/12 collide at sf0.001)
        b0 = (d40.select("doc_id",
                         minhash_signature_md5(F.col("text"), 64,
                                               3).alias("s"))
              .select("doc_id",
                      F.explode(_band_rows_md5("s", 16, 4)).alias("b"))
              .select("doc_id", "b.band", "b.bh"))
        coll = (b0.alias("x").join(
            b0.alias("y"),
            (F.col("x.band") == F.col("y.band"))
            & (F.col("x.bh") == F.col("y.bh"))
            & (F.col("x.doc_id") != F.col("y.doc_id")))
            .select(F.col("x.doc_id").alias("doc_id")).distinct())
        d = d40.join(coll, "doc_id", "left_anti")
        assert d.count() >= 30, sf_dir  # exclusion stays non-vacuous
        waves = (d
                 .unionByName(d.select(
                     (F.col("doc_id") + 10000).alias("doc_id"),
                     F.concat("text", F.lit(" zzz")).alias("text")))
                 .unionByName(d.select(
                     (F.col("doc_id") + 20000).alias("doc_id"), "text")))
        bands = (waves.select(
            "doc_id",
            minhash_signature_md5(F.col("text"), 64, 3).alias("s"))
            .select("doc_id", F.explode(_band_rows_md5("s", 16, 4)).alias("b"))
            .select(F.expr("doc_id div 10000").alias("wave"), "doc_id",
                    "b.band", "b.bh"))
        shared = (bands.alias("a").join(
            bands.alias("b"),
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bh") == F.col("b.bh"))
            & (F.col("a.wave") == F.col("b.wave"))
            & (F.col("a.doc_id") < F.col("b.doc_id"))).count())
        assert shared == 0, sf_dir
