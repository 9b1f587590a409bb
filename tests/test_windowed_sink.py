"""Windowed sharded file sink (reference WriteFiles/FileBasedSink
parity — sources/io.py::windowed_sharded_write): Beam-convention shard
names, two-phase finalize-rename (no temp residue, nothing final until
finalize), deterministic sorted contents, and the pane-stamped
foreachBatch streaming twin."""

from __future__ import annotations

import glob
import os
import tempfile

from pyspark.sql import functions as F

from apache_beam_spark.sources.io import (windowed_sharded_write,
                                          windowed_sharded_write_stream)

H_US = 3_600_000_000
T0 = 48 * H_US                     # off epoch 0


def _df(spark, rows):
    return (spark.createDataFrame(rows, "event_id long, tus long")
            .select("event_id", F.timestamp_micros("tus").alias("ts")))


def test_windowed_sharded_write_names_and_contents(spark, tmp_path):
    rows = [(i, T0 + (i % 2) * H_US + i * 1000) for i in range(1, 21)]
    out = str(tmp_path / "sink")
    manifest = windowed_sharded_write(
        _df(spark, rows), out, "ev", "1 hour", "ts",
        text_col="event_id", num_shards=3, shard_col="event_id")
    m = {(r["window_start_ms"], r["shard"]): r for r in manifest.collect()}
    # two hourly windows x 3 shards, all non-empty with 20 spread ids
    assert len(m) == 6
    # exact Beam shard naming, finalize removed the temp dir
    names = sorted(os.path.basename(p) for p in glob.glob(out + "/ev-*"))
    w0, w1 = T0 // 1000, T0 // 1000 + 3_600_000
    assert names == sorted(
        f"ev-{ws}-{ws + 3_600_000}-{s:05d}-of-00003.txt"
        for ws in (w0, w1) for s in range(3))
    assert glob.glob(out + "/.temp-beam-write*") == []
    # contents: exactly the ids of that (window, shard), sorted
    f = f"ev-{w0}-{w0 + 3_600_000}-00000-of-00003.txt"
    got = open(os.path.join(out, f)).read().splitlines()
    want = sorted(str(i) for i in range(1, 21)
                  if i % 2 == 0 and i % 3 == 0)
    assert got == want
    # manifest row counts sum to the input
    assert sum(r["n_rows"] for r in m.values()) == 20


def test_windowed_sharded_write_requires_shard_col(spark, tmp_path):
    import pytest
    with pytest.raises(ValueError, match="shard_col"):
        windowed_sharded_write(
            _df(spark, [(1, T0)]), str(tmp_path / "x"), "ev", "1 hour",
            "ts", text_col="event_id", num_shards=2)


def test_concurrent_writes_use_disjoint_salted_temps(spark, tmp_path):
    """FileBasedSink salts its temp location per write job so two
    concurrent writes into one out_dir can't interleave manifests; the
    finalize is scoped to its own salt.  A stale temp dir left by a
    crashed job is never touched by later writes."""
    out = str(tmp_path / "sink")
    stale = os.path.join(out, ".temp-beam-write-deadbeef0000")
    os.makedirs(stale)
    open(os.path.join(stale, "ev-0-1-00000-of-00001.txt"), "w").write("x\n")
    rows_a = [(i, T0 + i * 1000) for i in range(1, 6)]
    rows_b = [(i, T0 + i * 1000) for i in range(6, 11)]
    windowed_sharded_write(
        _df(spark, rows_a), out, "a", "1 hour", "ts",
        text_col="event_id", num_shards=1, shard_col="event_id")
    windowed_sharded_write(
        _df(spark, rows_b), out, "b", "1 hour", "ts",
        text_col="event_id", num_shards=1, shard_col="event_id")
    # both prefixes finalized; the stale salted dir is intact; neither
    # call's own temp dir remains
    assert len(glob.glob(out + "/a-*")) == 1
    assert len(glob.glob(out + "/b-*")) == 1
    assert os.path.exists(os.path.join(stale, "ev-0-1-00000-of-00001.txt"))
    assert glob.glob(out + "/.temp-beam-write*") == [stale]


def test_uri_out_dir_fails_fast(spark, tmp_path):
    """Executors open() and the driver os.replace()s the same paths, so
    a URI-scheme out_dir (executor-local temp files, FileNotFoundError
    at finalize on a real cluster) is rejected upfront with an error
    naming the shared-filesystem requirement."""
    import pytest
    with pytest.raises(ValueError, match="shared-filesystem"):
        windowed_sharded_write(
            _df(spark, [(1, T0)]), "hdfs://nn/out", "ev", "1 hour",
            "ts", text_col="event_id", num_shards=1,
            shard_col="event_id")


def test_windowed_sharded_write_stream_pane_stamped(spark, tmp_path):
    from apache_beam_spark.streaming.sources import TestStream

    ts = TestStream(str(tmp_path / "spool"))
    ts.add_elements([{"event_id": 1, "tus": T0},
                     {"event_id": 2, "tus": T0 + 1000}])
    ts.add_elements([{"event_id": 3, "tus": T0 + H_US}])
    src = (ts.stream(spark, "event_id long, tus long")
           .select("event_id", F.timestamp_micros("tus").alias("ts")))
    out = str(tmp_path / "ssink")
    q = windowed_sharded_write_stream(
        src, out, "ev", "1 hour", "ts", text_col="event_id",
        num_shards=2, shard_col="event_id",
        checkpoint=str(tmp_path / "ckpt")).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    names = sorted(os.path.basename(p) for p in glob.glob(out + "/ev-*"))
    w0 = T0 // 1000
    w1 = w0 + 3_600_000
    # batch 0: window 0, shards 1 (id 1) and 0 (id 2); batch 1: window
    # 1 shard 1 (id 3) — each file pane-stamped with its batch id
    assert names == sorted([
        f"ev-{w0}-{w1}-00000-of-00002-pane0.txt",
        f"ev-{w0}-{w1}-00001-of-00002-pane0.txt",
        f"ev-{w1}-{w1 + 3_600_000}-00001-of-00002-pane1.txt"])
    body = open(os.path.join(
        out, f"ev-{w0}-{w1}-00001-of-00002-pane0.txt")).read()
    assert body == "1\n"
