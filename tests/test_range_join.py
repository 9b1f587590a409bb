"""Range-join operator tests: bin-probe correctness incl. boundary,
offset windows, and the no-nested-loop plan property."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.operators.rangejoin import range_join
from apache_beam_spark.plans import plan_string


def _df(spark, name, rows):
    return spark.createDataFrame(
        [(k, f"2024-01-01 {t}", i) for i, (k, t) in enumerate(rows)],
        f"k string, {name}_raw string, {name}_id long",
    ).select("k", F.col(f"{name}_raw").cast("timestamp").alias(f"{name}ts"),
             f"{name}_id")


def test_range_join_boundaries(spark):
    left = _df(spark, "l", [("a", "09:00:00")])
    right = _df(spark, "r", [
        ("a", "09:00:00"),   # diff 0      -> in  (inclusive lower)
        ("a", "09:30:00"),   # diff 30m    -> in  (inclusive upper)
        ("a", "09:30:01"),   # diff 30m+1s -> out
        ("a", "08:59:59"),   # diff -1s    -> out
        ("b", "09:10:00"),   # wrong key   -> out
    ])
    out = range_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     lower="0 seconds", upper="30 minutes")
    assert sorted(r["r_id"] for r in out.collect()) == [0, 1]


def test_range_join_offset_window(spark):
    """Window far from zero offset (the naive +-1-bin-around-left trick
    breaks here): matches 50-51 hours after the left row."""
    left = _df(spark, "l", [("a", "00:00:00")])
    right = spark.createDataFrame(
        [("a", "2024-01-03 02:30:00", 0),   # +50.5h -> in
         ("a", "2024-01-03 04:00:00", 1),   # +52h   -> out
         ("a", "2024-01-01 01:00:00", 2)],  # +1h    -> out
        "k string, raw string, r_id long",
    ).select("k", F.col("raw").cast("timestamp").alias("rts"), "r_id")
    out = range_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     lower="50 hours", upper="51 hours")
    assert [r["r_id"] for r in out.collect()] == [0]


def test_range_join_negative_window(spark):
    left = _df(spark, "l", [("a", "09:00:00")])
    right = _df(spark, "r", [("a", "08:30:00"), ("a", "09:10:00")])
    out = range_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     lower="-1 hour", upper="0 seconds")
    assert [r["r_id"] for r in out.collect()] == [0]


def test_range_join_no_nested_loop(spark):
    left = _df(spark, "l", [("a", "09:00:00")])
    right = _df(spark, "r", [("a", "09:10:00")])
    out = range_join(left, right, on="k", left_ts="lts", right_ts="rts")
    assert "BroadcastNestedLoopJoin" not in plan_string(out)
    assert "CartesianProduct" not in plan_string(out)


def test_bad_interval_rejected(spark):
    left = _df(spark, "l", [("a", "09:00:00")])
    with pytest.raises(ValueError, match="unsupported interval"):
        range_join(left, left, on="k", left_ts="lts", right_ts="lts",
                   lower="0 parsecs", upper="1 hour")

def test_range_join_left_outer_keeps_unmatched(spark):
    """Outer semantics are real: unmatched left rows appear exactly once
    null-extended (the exploded probe must not duplicate or drop them)."""
    left = _df(spark, "l", [("a", "09:00:00"), ("a", "15:00:00"), ("c", "09:00:00")])
    right = _df(spark, "r", [("a", "09:10:00")])
    out = range_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     lower="0 seconds", upper="30 minutes", how="left").collect()
    assert len(out) == 3
    matched = [r for r in out if r["r_id"] is not None]
    unmatched = sorted((r["k"], r["l_id"]) for r in out if r["r_id"] is None)
    assert [(r["l_id"], r["r_id"]) for r in matched] == [(0, 0)]
    assert unmatched == [("a", 1), ("c", 2)]


def test_range_join_full_outer(spark):
    left = _df(spark, "l", [("a", "09:00:00")])
    right = _df(spark, "r", [("a", "09:10:00"), ("b", "09:00:00")])
    out = range_join(left, right, on="k", left_ts="lts", right_ts="rts",
                     lower="0 seconds", upper="30 minutes", how="full").collect()
    assert len(out) == 2
    assert sorted((r["l_id"] is None, r["r_id"] is None) for r in out) == \
        [(False, False), (True, False)]


def test_range_join_bad_how_rejected(spark):
    left = _df(spark, "l", [("a", "09:00:00")])
    with pytest.raises(ValueError, match="unsupported how"):
        range_join(left, left, on="k", left_ts="lts", right_ts="lts", how="cross")
