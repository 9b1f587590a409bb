from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from apache_beam_spark.operators.ranks import global_percent_rank


def test_matches_naive_global_sort(spark):
    df = spark.createDataFrame(
        [(i, ((i * 37) % 100) / 100.0) for i in range(200)],
        ["doc_id", "s"])
    got = {r.doc_id: r.pct
           for r in global_percent_rank(df, F.col("s"), "doc_id").collect()}
    order = sorted(range(200), key=lambda i: (((i * 37) % 100) / 100.0, i))
    want = {i: round(k / 199, 6) for k, i in enumerate(order)}
    assert got == want


def test_ties_break_by_id(spark):
    df = spark.createDataFrame([(1, 0.5), (2, 0.5), (3, 0.1)],
                               ["doc_id", "s"])
    got = {r.doc_id: r.pct
           for r in global_percent_rank(df, F.col("s"), "doc_id").collect()}
    assert got == {3: 0.0, 1: 0.5, 2: 1.0}


def test_null_score_raises_not_drops(spark):
    df = spark.createDataFrame([(1, 0.5), (2, None), (3, 0.1)],
                               ["doc_id", "s"])
    with pytest.raises(Exception, match="NULL score"):
        global_percent_rank(df, F.col("s"), "doc_id").collect()


def test_single_row_pct_is_zero(spark):
    df = spark.createDataFrame([(1, 0.7)], ["doc_id", "s"])
    [r] = global_percent_rank(df, F.col("s"), "doc_id").collect()
    assert r.pct == 0.0


def test_bucket_width_does_not_change_result(spark):
    df = spark.createDataFrame(
        [(i, (i % 17) / 17.0) for i in range(100)], ["doc_id", "s"])
    a = sorted(map(tuple, global_percent_rank(
        df, F.col("s"), "doc_id", bucket_width=0.001).collect()))
    b = sorted(map(tuple, global_percent_rank(
        df, F.col("s"), "doc_id", bucket_width=0.25).collect()))
    assert a == b
