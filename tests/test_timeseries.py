"""gap_fill_linear (operators/timeseries.py): hand-computed integer
lerp, per-key independent spans, negative slopes, multi-bucket gaps."""

from __future__ import annotations

from apache_beam_spark.operators.timeseries import gap_fill_linear


def _fill(spark, rows, step=1):
    df = spark.createDataFrame(rows, "k string, t bigint, v bigint")
    out = gap_fill_linear(df, "k", "t", "v", step=step)
    return sorted((r["k"], r["t"], r["v"], r["is_gap"])
                  for r in out.collect())


def test_linear_interp_hand_computed(spark):
    # k=a: 10 at t=0, 40 at t=3 -> gaps 20, 30; k=b: single point
    got = _fill(spark, [("a", 0, 10), ("a", 3, 40), ("b", 7, 5)])
    assert got == [
        ("a", 0, 10, 0), ("a", 1, 20, 1), ("a", 2, 30, 1),
        ("a", 3, 40, 0), ("b", 7, 5, 0)]


def test_negative_slope_floor(spark):
    # 40 -> 10 over 3 steps: exact thirds, floor(40-10k) with k=1,2
    got = _fill(spark, [("a", 0, 40), ("a", 3, 10)])
    assert got == [("a", 0, 40, 0), ("a", 1, 30, 1),
                   ("a", 2, 20, 1), ("a", 3, 10, 0)]
    # non-exact: 5 -> 0 over 4 steps: floor(5 - 1.25k) = 3, 2, 1
    got = _fill(spark, [("a", 0, 5), ("a", 4, 0)])
    assert [r[2] for r in got] == [5, 3, 2, 1, 0]


def test_observed_rows_pass_through_between_gaps(spark):
    got = _fill(spark, [("a", 0, 0), ("a", 2, 100), ("a", 4, 0)])
    assert got == [("a", 0, 0, 0), ("a", 1, 50, 1), ("a", 2, 100, 0),
                   ("a", 3, 50, 1), ("a", 4, 0, 0)]


def test_step_grid(spark):
    got = _fill(spark, [("a", 0, 0), ("a", 30, 3)], step=10)
    assert got == [("a", 0, 0, 0), ("a", 10, 1, 1),
                   ("a", 20, 2, 1), ("a", 30, 3, 0)]


def test_misaligned_bucket_raises(spark):
    # t=15 is off the step-10 grid anchored at t=0: previously it was
    # silently dropped (grid join missed it) and neighbors
    # interpolated across; now the contract violation raises.
    import pytest
    with pytest.raises(Exception, match="not aligned"):
        _fill(spark, [("a", 0, 0), ("a", 15, 7), ("a", 30, 3)],
              step=10)
    # aligned multi-key data still fine (guard is per-key anchored)
    got = _fill(spark, [("a", 5, 1), ("a", 25, 3), ("b", 2, 4)],
                step=10)
    assert got == [("a", 5, 1, 0), ("a", 15, 2, 1), ("a", 25, 3, 0),
                   ("b", 2, 4, 0)]
