"""As-of join and windowed-rollup operator tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.operators.asof import asof_join
from apache_beam_spark.operators.rollup import rollup_windows


def _ts(s):
    return f"2024-01-01 {s}"


@pytest.fixture()
def quotes_trades(spark):
    quotes = spark.createDataFrame(
        [("A", _ts("09:00:00"), 10.0), ("A", _ts("09:05:00"), 11.0),
         ("B", _ts("09:01:00"), 50.0)],
        "sym string, qts string, px double",
    ).select("sym", F.col("qts").cast("timestamp").alias("qts"), "px")
    trades = spark.createDataFrame(
        [("A", _ts("09:00:00")), ("A", _ts("09:04:59")), ("A", _ts("09:05:00")),
         ("B", _ts("08:59:00")), ("C", _ts("09:00:00"))],
        "sym string, tts string",
    ).select("sym", F.col("tts").cast("timestamp").alias("tts"))
    return quotes, trades


def test_asof_backward_semantics(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                    right_cols=["px"])
    got = {(r["sym"], str(r["tts"])): r["px"] for r in out.collect()}
    assert got[("A", "2024-01-01 09:00:00")] == 10.0   # equal ts matches
    assert got[("A", "2024-01-01 09:04:59")] == 10.0   # strictly before 09:05
    assert got[("A", "2024-01-01 09:05:00")] == 11.0   # newer quote wins
    assert got[("B", "2024-01-01 08:59:00")] is None   # nothing at-or-before
    assert got[("C", "2024-01-01 09:00:00")] is None   # unseen key, row kept


def test_asof_tolerance(spark, quotes_trades):
    quotes, trades = quotes_trades
    out = asof_join(trades, quotes, on="sym", left_ts="tts", right_ts="qts",
                    right_cols=["px"], tolerance="1 minute")
    got = {(r["sym"], str(r["tts"])): r["px"] for r in out.collect()}
    assert got[("A", "2024-01-01 09:00:00")] == 10.0   # fresh
    assert got[("A", "2024-01-01 09:04:59")] is None   # ~5 min stale -> nulled


def test_rollup_cascade_matches_direct(spark):
    from apache_beam_spark.sources.tables import load_table

    ev = load_table(spark, "events", "/root/testdata/sf0.001") \
        .withColumn("vd", F.col("value").cast("decimal(18,4)"))
    levels = rollup_windows(ev, "ts", ["event_type"],
                            {"total": "sum:vd", "n": "count", "vmin": "min:value"},
                            ["1 hour", "1 day"])
    day = levels["1 day"].select(
        F.col("window.start").alias("d"), "event_type", "total", "n", "vmin")
    direct = ev.groupBy(F.window("ts", "1 day").alias("w"), "event_type").agg(
        F.sum("vd").alias("total"), F.count(F.lit(1)).alias("n"),
        F.min("value").alias("vmin"),
    ).select(F.col("w.start").alias("d"), "event_type", "total", "n", "vmin")
    a = sorted(map(tuple, day.collect()))
    b = sorted(map(tuple, direct.collect()))
    assert a == b


def test_rollup_rejects_non_decomposable(spark):
    ev = spark.createDataFrame([(1,)], "v int")
    with pytest.raises(ValueError, match="non-decomposable"):
        rollup_windows(ev, "v", [], {"a": "avg:v"}, ["1 hour"])

def test_asof_null_field_is_row_atomic(spark):
    """ADVICE regression: a right row with NULL in one column must NOT
    borrow that column from an older right row — the matched row is
    atomic (pandas merge_asof semantics)."""
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 100)], "k int, lts long") \
        .select("k", F.timestamp_seconds("lts").alias("lts"))
    right = spark.createDataFrame(
        [(1, 50, 7.0, "old"), (1, 90, None, "new")],
        "k int, rts long, b double, tag string",
    ).select("k", F.timestamp_seconds("rts").alias("rts"), "b", "tag")
    out = asof_join(left, right, on="k", left_ts="lts", right_ts="rts").collect()
    assert len(out) == 1
    # matched row is ts=90 -> b must be NULL (not 7.0 from ts=50), tag "new"
    assert out[0]["tag"] == "new"
    assert out[0]["b"] is None


def test_asof_collision_rejected(spark):
    import pytest
    from pyspark.sql import functions as F

    left = spark.createDataFrame([(1, 100, 1.0)], "k int, lts long, b double") \
        .select("k", F.timestamp_seconds("lts").alias("lts"), "b")
    right = spark.createDataFrame([(1, 50, 2.0)], "k int, rts long, b double") \
        .select("k", F.timestamp_seconds("rts").alias("rts"), "b")
    with pytest.raises(ValueError, match="collide"):
        asof_join(left, right, on="k", left_ts="lts", right_ts="rts")
