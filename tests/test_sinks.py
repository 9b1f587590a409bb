"""Streaming sink tests: parquet file sink (commit protocol) and
foreachBatch custom sinks."""

from __future__ import annotations

import glob

from apache_beam_spark.streaming import TestStream, foreach_batch, write_parquet_stream


def _feed(spool):
    ts = TestStream(spool)
    ts.add_elements([{"k": "a", "v": 1}, {"k": "b", "v": 2}])
    ts.add_elements([{"k": "a", "v": 3}])
    return ts


def test_parquet_stream_sink(spark, tmp_path):
    ts = _feed(str(tmp_path / "spool"))
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    q = write_parquet_stream(ts.stream(spark, "k string, v long"), out, ckpt)
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    back = spark.read.parquet(out)
    assert sorted((r["k"], r["v"]) for r in back.collect()) == \
        [("a", 1), ("a", 3), ("b", 2)]
    # exactly-once bookkeeping: the sink wrote a commit log
    assert glob.glob(f"{out}/_spark_metadata/*")


def test_foreach_batch_sink(spark, tmp_path):
    ts = _feed(str(tmp_path / "spool"))
    seen: dict[int, int] = {}

    def fn(batch_df, batch_id):
        seen[batch_id] = batch_df.count()

    q = foreach_batch(ts.stream(spark, "k string, v long"), fn,
                      str(tmp_path / "ckpt2"), output_mode="append")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert sum(seen.values()) == 3
    assert len(seen) == 2  # one call per micro-batch


def test_idempotent_foreach_batch(spark, tmp_path):
    """Exactly-once: re-running the same stream against the same commit
    dir must not re-apply batches (simulates foreachBatch re-delivery)."""
    from apache_beam_spark.streaming.sinks import idempotent_foreach_batch

    ts = _feed(str(tmp_path / "spool"))
    applied = []

    def fn(batch_df, batch_id):
        applied.append((batch_id, batch_df.count()))

    commit = str(tmp_path / "commits")
    for attempt, ckpt in enumerate(["c1", "c2"]):
        # second attempt: fresh checkpoint -> batches re-delivered from 0,
        # but the commit markers suppress re-application
        q = idempotent_foreach_batch(
            ts.stream(spark, "k string, v long"), fn,
            str(tmp_path / ckpt), commit)
        try:
            q.processAllAvailable()
        finally:
            q.stop()
    assert sum(n for _, n in applied) == 3  # each row applied exactly once
