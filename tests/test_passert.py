"""PAssert / law-checker tests (reference testing methodology, §5)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.operators.combine import CombineFn
from apache_beam_spark.testing import (
    PAssert,
    check_combine_fn_laws,
    check_window_fn_laws,
)
from apache_beam_spark.windowing import FixedWindows, SlidingWindows


def test_contains_in_any_order(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2), ("a", 1)], ["k", "v"])
    PAssert.that(df).contains_in_any_order(("a", 1), ("a", 1), ("b", 2))
    with pytest.raises(AssertionError, match="bag mismatch"):
        PAssert.that(df).contains_in_any_order(("a", 1), ("b", 2))


def test_is_empty_and_satisfies(spark):
    df = spark.createDataFrame([(1,)], ["v"]).filter("v > 5")
    PAssert.that(df).is_empty()
    full = spark.createDataFrame([(1,), (2,)], ["v"])
    PAssert.that(full).satisfies(lambda rows: sum(r.v for r in rows) == 3)


def test_in_window_scoped_assertion(spark):
    df = spark.createDataFrame(
        [("2024-01-01 00:00:30", 1), ("2024-01-01 00:01:30", 2)], ["ts_raw", "v"]
    ).select(F.col("ts_raw").cast("timestamp").alias("ts"), "v")
    agg = df.groupBy(F.window("ts", "1 minute").alias("window")) \
        .agg(F.sum("v").alias("total"))
    PAssert.that(agg).in_window("2024-01-01 00:00:00", "2024-01-01 00:01:00") \
        .contains_in_any_order((1,))


class _MeanFn(CombineFn):
    def create_accumulator(self):
        return (0, 0)

    def add_inputs(self, acc, values):
        return (acc[0] + sum(values), acc[1] + len(values))

    def merge_accumulators(self, accs):
        return (sum(a[0] for a in accs), sum(a[1] for a in accs))

    def extract_output(self, acc):
        return acc[0] / acc[1] if acc[1] else None


def test_combine_fn_laws_pass():
    check_combine_fn_laws(_MeanFn(), [1, 2, 3, 4, 5, 10])


def test_combine_fn_laws_catch_violation():
    class _Broken(_MeanFn):
        def merge_accumulators(self, accs):  # drops all but first — wrong
            return accs[0]

    with pytest.raises(AssertionError, match="CombineFn law"):
        check_combine_fn_laws(_Broken(), [1, 2, 3, 4, 5, 10])


def test_window_fn_laws(spark):
    check_window_fn_laws(FixedWindows("5 minutes"),
                         ["2024-01-01 00:01:00", "2024-03-07 13:59:59"], spark)
    check_window_fn_laws(SlidingWindows("10 minutes", "5 minutes"),
                         ["2024-01-01 00:01:00"], spark)
