"""Streaming session windows (the `stream_session_exact` entry): the
native session_window streaming state vs its batch twin and a
sequential gaps-and-islands reference."""

from __future__ import annotations

import tempfile

import pytest
from pyspark.sql import functions as F


def _stream_sessions(spark, rows, gap="10 minutes"):
    from apache_beam_spark.streaming.sources import TestStream, read_bounded

    ts = TestStream(tempfile.mkdtemp(prefix="t_ssession_"))
    ts.add_elements(rows)
    tail = max(r["tus"] for r in rows) + 10**15
    ts.add_elements([{"user_id": 999999, "tus": tail}])
    sdf = (ts.stream(spark, "user_id bigint, tus bigint")
           .select("user_id", F.timestamp_micros("tus").alias("ts"))
           .withWatermark("ts", gap)
           .groupBy("user_id", F.session_window("ts", gap))
           .agg(F.count(F.lit(1)).alias("n")))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        out = read_bounded(sdf)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    return sorted(
        (r["user_id"], r["session_window"]["start"],
         r["session_window"]["end"], r["n"])
        for r in out.filter(F.col("user_id") < 999999).collect())


def _batch_sessions(spark, rows, gap="10 minutes"):
    df = (spark.createDataFrame([(r["user_id"], r["tus"]) for r in rows],
                                "user_id bigint, tus bigint")
          .select("user_id", F.timestamp_micros("tus").alias("ts")))
    out = (df.groupBy("user_id", F.session_window("ts", gap))
           .agg(F.count(F.lit(1)).alias("n")))
    return sorted(
        (r["user_id"], r["session_window"]["start"],
         r["session_window"]["end"], r["n"]) for r in out.collect())


def _ref_sessions(rows, gap_us=600_000_000):
    """Sequential gaps-and-islands: merge at <= gap (the probe-verified
    Spark convention), end = last ts + gap (as epoch micros)."""
    by_user: dict = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["tus"])
    out = []
    for u, ts in by_user.items():
        ts.sort()
        start, last, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t - last <= gap_us:
                last, n = t, n + 1
            else:
                out.append((u, start, last + gap_us, n))
                start, last, n = t, t, 1
        out.append((u, start, last + gap_us, n))
    return sorted(out)


M = 60_000_000  # one minute in µs


def test_stream_matches_sequential_reference(spark):
    rows = [{"user_id": u, "tus": t} for u, t in [
        (1, 0), (1, 5 * M), (1, 30 * M),          # two sessions
        (2, 0), (2, 10 * M),                      # exact-gap adjacency MERGES
        (2, 21 * M),                              # > gap after 10m -> new
        (3, 7 * M),                               # singleton
    ]]
    got = _stream_sessions(spark, rows)
    want = [(u, s, e, n) for u, s, e, n in _ref_sessions(rows)]
    got_us = [(u, int(s.timestamp() * 1e6), int(e.timestamp() * 1e6), n)
              for u, s, e, n in got]
    assert got_us == want
    # the exact-gap case really merged (one session of 2 for user 2
    # before 21m)
    assert (2, 0, 20 * M, 2) in got_us


def test_stream_matches_batch_twin_on_real_events(spark):
    """Batch/stream parity on the real event stream — the pin the
    `stream_session_exact` entry docstring promises."""
    from apache_beam_spark.sources.tables import load_table

    ev = (load_table(spark, "events", "/root/testdata/sf0.001")
          .filter(F.col("user_id") < 200)
          .select("user_id",
                  F.unix_micros(F.col("ts").cast("timestamp"))
                  .alias("tus")))
    rows = [r.asDict() for r in ev.collect()]
    assert rows, "fixture events missing"
    assert _stream_sessions(spark, rows) == _batch_sessions(spark, rows)


def test_late_event_within_watermark_joins_session(spark):
    """An event arriving one micro-batch late but inside the watermark
    delay still lands in (and extends) its session."""
    rows1 = [{"user_id": 1, "tus": 0}, {"user_id": 1, "tus": 8 * M}]
    from apache_beam_spark.streaming.sources import TestStream, read_bounded

    ts = TestStream(tempfile.mkdtemp(prefix="t_ssession_late_"))
    ts.add_elements(rows1)
    ts.add_elements([{"user_id": 1, "tus": 4 * M}])   # late, in-delay
    ts.add_elements([{"user_id": 999999, "tus": 10**15}])
    sdf = (ts.stream(spark, "user_id bigint, tus bigint")
           .select("user_id", F.timestamp_micros("tus").alias("ts"))
           .withWatermark("ts", "10 minutes")
           .groupBy("user_id", F.session_window("ts", "10 minutes"))
           .agg(F.count(F.lit(1)).alias("n")))
    prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        out = read_bounded(sdf)
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", prev)
    got = [(r["user_id"], r["n"]) for r in
           out.filter(F.col("user_id") == 1).collect()]
    assert got == [(1, 3)]


def test_entry_query_shape(spark):
    import __spark_entry__ as e

    df = e.queries()["stream_session_exact"](spark, "/root/testdata/sf0.001")
    rows = df.collect()
    assert rows and df.columns == ["user_id", "session_start",
                                   "session_end", "n_events"]
    assert all(r["session_end"] > r["session_start"] for r in rows)
