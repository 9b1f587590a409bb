"""Streaming changelog -> snapshot materialization
(streaming/sinks.py upsert_snapshot_sink)."""

from __future__ import annotations

import os

from apache_beam_spark.streaming.sources import TestStream

SCHEMA = "id long, seq long, payload string, op string"


def test_upsert_snapshot_sink(spark, tmp_path):
    ts = TestStream(str(tmp_path / "changes"))
    ts.add_elements([
        {"id": 1, "seq": 10, "payload": "a1", "op": "U"},
        {"id": 2, "seq": 10, "payload": "b1", "op": "U"}])
    ts.add_elements([
        {"id": 1, "seq": 20, "payload": "a2", "op": "U"},   # update
        {"id": 2, "seq": 20, "payload": "x", "op": "D"},    # delete
        {"id": 3, "seq": 20, "payload": "c1", "op": "U"}])  # insert

    from apache_beam_spark.streaming.sinks import upsert_snapshot_sink

    out = str(tmp_path / "snapshot")
    q = upsert_snapshot_sink(
        ts.stream(spark, SCHEMA), out, str(tmp_path / "ckpt"),
        keys=["id"], seq_col="seq")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    snap = spark.read.parquet(os.path.join(out, "current"))
    got = {r["id"]: r["payload"] for r in snap.collect()}
    assert got == {1: "a2", 3: "c1"}   # 2 deleted, 1 updated, 3 inserted
    # no staging/old leftovers from the atomic swap
    leftovers = [d for d in os.listdir(out) if d != "current"]
    assert leftovers == []


def test_upsert_sink_restart_from_checkpoint(spark, tmp_path):
    """Stop after batch 1, restart with the same checkpoint: batch 1
    is not re-applied (offsets committed), batch 2 folds in, final
    snapshot is correct."""
    spool = str(tmp_path / "changes2")
    ts = TestStream(spool)
    ts.add_elements([
        {"id": 1, "seq": 10, "payload": "a1", "op": "U"}])

    from apache_beam_spark.streaming.sinks import upsert_snapshot_sink

    out, ckpt = str(tmp_path / "snap2"), str(tmp_path / "ckpt2")
    q = upsert_snapshot_sink(ts.stream(spark, SCHEMA), out, ckpt,
                             keys=["id"], seq_col="seq")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    ts.add_elements([
        {"id": 1, "seq": 20, "payload": "a2", "op": "U"},
        {"id": 2, "seq": 20, "payload": "b1", "op": "U"}])
    q2 = upsert_snapshot_sink(ts.stream(spark, SCHEMA), out, ckpt,
                              keys=["id"], seq_col="seq")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    snap = spark.read.parquet(os.path.join(out, "current"))
    assert {r["id"]: r["payload"] for r in snap.collect()} == \
        {1: "a2", 2: "b1"}


def test_upsert_sink_recovers_from_mid_swap_crash(spark, tmp_path):
    """A crash between ``rename(current, old)`` and
    ``rename(staged, current)`` leaves no ``current`` directory; the
    next merge must restore the stranded snapshot instead of folding
    the replayed batch into an empty base (which would silently drop
    every previously-accumulated key)."""
    import shutil

    spool = str(tmp_path / "changes3")
    ts = TestStream(spool)
    ts.add_elements([
        {"id": 1, "seq": 10, "payload": "a1", "op": "U"},
        {"id": 2, "seq": 10, "payload": "b1", "op": "U"}])

    from apache_beam_spark.streaming.sinks import upsert_snapshot_sink

    out, ckpt = str(tmp_path / "snap3"), str(tmp_path / "ckpt3")
    q = upsert_snapshot_sink(ts.stream(spark, SCHEMA), out, ckpt,
                             keys=["id"], seq_col="seq")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    # simulate the mid-swap crash: current was moved aside, the
    # replacement never landed, and the checkpoint did not commit the
    # batch (so it will be replayed on restart)
    cur = os.path.join(out, "current")
    os.rename(cur, os.path.join(out, "_old_7"))
    shutil.rmtree(ckpt)  # uncommitted batch -> full replay

    ts.add_elements([{"id": 3, "seq": 20, "payload": "c1", "op": "U"}])
    q2 = upsert_snapshot_sink(ts.stream(spark, SCHEMA), out, ckpt,
                              keys=["id"], seq_col="seq")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()

    snap = spark.read.parquet(cur)
    got = {r["id"]: r["payload"] for r in snap.collect()}
    assert got == {1: "a1", 2: "b1", 3: "c1"}  # nothing lost
    assert [d for d in os.listdir(out) if d != "current"] == []

    # staged variant: the fully-written staged snapshot wins over old
    os.rename(cur, os.path.join(out, "_staged_9"))
    shutil.rmtree(ckpt)
    ts.add_elements([{"id": 4, "seq": 30, "payload": "d1", "op": "U"}])
    q3 = upsert_snapshot_sink(ts.stream(spark, SCHEMA), out, ckpt,
                              keys=["id"], seq_col="seq")
    try:
        q3.processAllAvailable()
    finally:
        q3.stop()
    got = {r["id"]: r["payload"]
           for r in spark.read.parquet(cur).collect()}
    assert got == {1: "a1", 2: "b1", 3: "c1", 4: "d1"}


def test_upsert_sink_first_batch_partial_staged_not_promoted(spark, tmp_path):
    """A crash DURING the very first batch's staged write leaves a
    partial ``_staged_<id>`` (no ``_SUCCESS`` marker) and no
    ``current`` at all.  recover() must NOT promote the partial dir —
    that would wedge every replay on corrupt parquet — but delete it
    and let the replayed batch rebuild from the empty base
    (ADVICE r4: the pre-fix code renamed the partial dir blindly)."""
    spool = str(tmp_path / "changes4")
    ts = TestStream(spool)
    ts.add_elements([
        {"id": 1, "seq": 10, "payload": "a1", "op": "U"},
        {"id": 2, "seq": 10, "payload": "b1", "op": "U"}])

    from apache_beam_spark.streaming.sinks import upsert_snapshot_sink

    out, ckpt = str(tmp_path / "snap4"), str(tmp_path / "ckpt4")
    # simulate the half-written staged dir Spark leaves mid-job: a
    # _temporary scratch subdir, no _SUCCESS, no committed part files
    partial = os.path.join(out, "_staged_0")
    os.makedirs(os.path.join(partial, "_temporary", "0"))

    q = upsert_snapshot_sink(ts.stream(spark, SCHEMA), out, ckpt,
                             keys=["id"], seq_col="seq")
    try:
        q.processAllAvailable()
    finally:
        q.stop()

    cur = os.path.join(out, "current")
    got = {r["id"]: r["payload"] for r in spark.read.parquet(cur).collect()}
    assert got == {1: "a1", 2: "b1"}
    assert [d for d in os.listdir(out) if d != "current"] == []

    # a fully-committed staged dir (has _SUCCESS) IS still promoted
    # even when no current exists (the crash-between-renames case)
    import shutil
    os.rename(cur, os.path.join(out, "_staged_9"))
    shutil.rmtree(ckpt)
    ts.add_elements([{"id": 3, "seq": 20, "payload": "c1", "op": "U"}])
    q2 = upsert_snapshot_sink(ts.stream(spark, SCHEMA), out, ckpt,
                              keys=["id"], seq_col="seq")
    try:
        q2.processAllAvailable()
    finally:
        q2.stop()
    got = {r["id"]: r["payload"] for r in spark.read.parquet(cur).collect()}
    assert got == {1: "a1", 2: "b1", 3: "c1"}


def test_streaming_pipeline_rate_limit_into_upsert(spark, tmp_path):
    """Composability of the streaming stack: events are throttled by
    the stateful rate limiter, and the admitted stream feeds the
    foreachBatch upsert sink as a changelog — final snapshot holds the
    latest ADMITTED event per user."""
    from apache_beam_spark.streaming.sinks import upsert_snapshot_sink
    from apache_beam_spark.streaming.stateful import streaming_rate_limit
    from pyspark.sql import functions as F

    ts = TestStream(str(tmp_path / "pipe"))
    ts.add_elements([
        {"user": "a", "ts": "2024-01-01T00:00:01Z", "event_id": 1},
        {"user": "a", "ts": "2024-01-01T00:00:02Z", "event_id": 2},
        {"user": "a", "ts": "2024-01-01T00:00:03Z", "event_id": 3},  # dropped
        {"user": "b", "ts": "2024-01-01T00:00:04Z", "event_id": 4}])

    admitted = streaming_rate_limit(
        ts.stream(spark, "user string, ts timestamp, event_id long"),
        key="user", event_time="ts", id_col="event_id",
        window_ms=60_000, max_per_window=2)
    changes = admitted.select(
        "user", "event_id", F.col("ts_ms").alias("seq"),
        F.lit("U").alias("op"))
    out = str(tmp_path / "snap_pipe")
    q = upsert_snapshot_sink(changes, out, str(tmp_path / "ckpt_pipe"),
                             keys=["user"], seq_col="seq")
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    snap = spark.read.parquet(os.path.join(out, "current"))
    got = {r["user"]: r["event_id"] for r in snap.collect()}
    # a's latest ADMITTED event is 2 (3 was throttled), b's is 4
    assert got == {"a": 2, "b": 4}
