"""Bucketed-join plan test: pre-partitioned tables join with ZERO
shuffles — the amortize-the-shuffle-into-the-write pattern for 100 TB
repeated joins."""

from __future__ import annotations

import pytest

from apache_beam_spark.plans import shuffle_count
from apache_beam_spark.plans.bucketing import bucketed_join, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_tables(spark):
    import shutil

    # defensive cleanup: a killed prior run leaves the managed-table
    # location behind, and saveAsTable refuses to reuse it
    for t in ("b_orders", "b_lineitem"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"spark-warehouse/{t}", ignore_errors=True)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    write_bucketed(orders.withColumnRenamed("o_orderkey", "okey"),
                   "b_orders", ["okey"], num_buckets=8, sort_cols=["okey"])
    write_bucketed(lineitem.withColumnRenamed("l_orderkey", "okey"),
                   "b_lineitem", ["okey"], num_buckets=8, sort_cols=["okey"])
    yield "b_orders", "b_lineitem"
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_bucketed_join_no_shuffle(spark, bucketed_tables):
    lt, rt = bucketed_tables
    joined = bucketed_join(spark, lt, rt, on=["okey"])
    assert shuffle_count(joined) == 0, "bucketed join must not exchange"
    # and it's still correct
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    plain = o.join(li, o.o_orderkey == li.l_orderkey)
    assert joined.count() == plain.count()


def test_unbucketed_join_does_shuffle(spark):
    o = spark.read.parquet(f"{SF}/orders.parquet")
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = o.join(li, o.o_orderkey == li.l_orderkey)
        assert shuffle_count(joined) >= 2  # both sides exchange
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64m")


def test_salted_join_matches_plain_join(spark):
    """Salting redistributes a hot key across n_salts tasks without
    changing the result (inner and left, incl. unmatched left rows)."""
    from pyspark.sql import functions as F

    from apache_beam_spark.operators.join import salted_join

    # 10k facts, 90% on one hot key; dim covers keys 0-4 only
    left = spark.range(10000).select(
        F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id") % 7).alias("k"),
        F.col("id").alias("v"))
    right = spark.range(5).select(F.col("id").alias("k"),
                                  (F.col("id") * 100).alias("w"))
    for how in ("inner", "left"):
        plain = sorted(map(tuple, left.join(right, "k", how).collect()))
        salted = sorted(map(tuple, salted_join(left, right, "k",
                                               n_salts=8, how=how).collect()))
        assert salted == plain, how
