"""Bloom-pruned incremental dedup (dedup/bloom.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.dedup.bloom import (
    bloom_anti_join, bloom_build, bloom_might_contain, bloom_params)


@pytest.fixture(scope="module")
def frames(spark):
    history = spark.range(0, 500).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    # batch: 200 known keys + 800 fresh ones
    new = spark.range(300, 1300).select(
        F.col("id").alias("rid"),
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    return history, new


def test_params_formula():
    m, k = bloom_params(1000, 0.01)
    assert 9000 < m < 10100          # -n ln p / ln2^2 ~ 9585
    assert 6 <= k <= 8
    assert bloom_params(0, 0.01)[0] >= 64


def test_no_false_negatives(spark, frames):
    history, _ = frames
    m, k = bloom_params(500, 0.01)
    bitmap = bloom_build(history, "k", m, k)
    probed = bloom_might_contain(history, bitmap, "k", m, k)
    assert probed.filter(~F.col("__might__")).count() == 0


def test_false_positive_rate_bounded(spark, frames):
    history, _ = frames
    m, k = bloom_params(500, 0.01)
    bitmap = bloom_build(history, "k", m, k)
    fresh = spark.range(10_000, 14_000).select(
        F.concat(F.lit("key-"), F.col("id")).alias("k"))
    fp = bloom_might_contain(fresh, bitmap, "k", m, k) \
        .filter(F.col("__might__")).count()
    assert fp / 4000 < 0.05          # target 1%, loose 5x margin


def test_anti_join_exact(spark, frames):
    history, new = frames
    got = sorted(r["rid"] for r in
                 bloom_anti_join(new, history, "k", expected=500).collect())
    ref = sorted(r["rid"] for r in
                 new.join(history, on="k", how="left_anti").collect())
    assert got == ref == list(range(500, 1300))
    # original columns survive untouched
    cols = bloom_anti_join(new, history, "k", expected=500).columns
    assert set(cols) == {"rid", "k"}


def test_probe_is_broadcast_only(spark, frames):
    """The batch-side probe must be k broadcast hash joins — no
    sort-merge join, no shuffle of the probed frame (the only
    hash-partition exchange in the plan belongs to the bitmap
    aggregation feeding the broadcast)."""
    history, new = frames
    m, k = bloom_params(500, 0.01)
    bitmap = bloom_build(history, "k", m, k)
    probed = bloom_might_contain(new, bitmap, "k", m, k)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastHashJoin") == k
    for line in plan.splitlines():
        if "Exchange hashpartitioning" in line:
            assert "word_idx" in line or "__pos__" in line, line


def test_map_probe_matches_join_probe(spark, frames):
    """bloom_might_contain_map (the single-row map broadcast used for
    map-sized bitmaps) must produce the identical verdict column to
    the k-join probe — same positions, same bits, row for row."""
    from apache_beam_spark.dedup.bloom import bloom_might_contain_map

    history, new = frames
    m, k = bloom_params(500, 0.01)
    bitmap = bloom_build(history, "k", m, k)
    a = {r["rid"]: r["__might__"] for r in
         bloom_might_contain(new, bitmap, "k", m, k).collect()}
    b = {r["rid"]: r["__might__"] for r in
         bloom_might_contain_map(new, bitmap, "k", m, k).collect()}
    assert a == b
    # and the map probe's plan is a single broadcast join, no shuffle
    # of the probed frame
    probed = bloom_might_contain_map(new, bitmap, "k", m, k)
    plan = probed._jdf.queryExecution().executedPlan().toString()
    assert "SortMergeJoin" not in plan
    assert plan.count("BroadcastNestedLoopJoin") == 1
