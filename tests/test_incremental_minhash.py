"""Incremental near-dup ingest (dedup/minhash.py::
minhash_band_index + minhash_dedup_incremental) — the LSH twin of the
exact dedup_incremental anti join; value-oracled end-to-end in
`dedup_incremental_minhash` (md5 mode), pinned here on planted data."""

from __future__ import annotations

from apache_beam_spark.dedup.minhash import (minhash_band_index,
                                             minhash_dedup_incremental)

A = "the quick brown fox jumps over the lazy dog again and again today"
B = "pack my box with five dozen liquor jugs before the long winter"
C = "completely unrelated text about spark shuffles and parquet readers"
D = "fourth novel document mentioning watermark state stores and arrow"


def _df(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_index_probe_drops_cross_batch_dups(spark):
    for hashing in ("xx", "md5"):
        hist = _df(spark, [(1, A), (2, B)])
        idx = minhash_band_index(hist, hashing=hashing)
        batch = _df(spark, [(10, A),                       # exact: drop
                            (11, A.replace("today", "tonight")),  # near
                            (12, C)])                      # novel: keep
        kept = {r["doc_id"] for r in
                minhash_dedup_incremental(batch, idx,
                                          hashing=hashing).collect()}
        assert 10 not in kept and 12 in kept, hashing
        # the near-dup shares >= 1 bucket with A here (pinned corpus)
        assert 11 not in kept, hashing


def test_in_batch_bucket_min_keeps_lowest_id(spark):
    for hashing in ("xx", "md5"):
        idx = minhash_band_index(_df(spark, [(1, B)]), hashing=hashing)
        batch = _df(spark, [(22, C), (21, C), (30, D)])    # in-batch dup
        kept = {r["doc_id"] for r in
                minhash_dedup_incremental(batch, idx,
                                          hashing=hashing).collect()}
        assert kept == {21, 30}, hashing


def test_empty_index_reduces_to_batch_dedup(spark):
    from apache_beam_spark.dedup.minhash import minhash_lsh_dedup

    batch = _df(spark, [(1, A), (2, A), (3, B), (4, C)])
    idx = minhash_band_index(batch.filter("doc_id < 0"))
    got = {r["doc_id"] for r in
           minhash_dedup_incremental(batch, idx).collect()}
    want = {r["doc_id"] for r in minhash_lsh_dedup(batch).collect()}
    assert got == want and 2 not in got


def test_text_never_shuffles(spark):
    """100 TB shape assertion: every hash-partitioned exchange in the
    incremental plan carries only (id, band, bh) — the document text is
    consumed by the signature projection and never moves."""
    hist = _df(spark, [(1, A), (2, B)])
    batch = _df(spark, [(10, C), (11, D)])
    out = minhash_dedup_incremental(batch, minhash_band_index(hist))
    plan = out._jdf.queryExecution().executedPlan().toString()
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "text" not in line, line
