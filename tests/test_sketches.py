"""Count-min sketch (operators/sketches.py) invariants."""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from apache_beam_spark.operators.sketches import (
    cms_counts, cms_estimate, cms_merge, count_min_sketch)

DEPTH, WIDTH = 4, 16


@pytest.fixture(scope="module")
def items(spark):
    # zipf-ish: item i appears (50 - i) times, 50 distinct items —
    # forces collisions at width 16
    return spark.range(50).select(
        F.explode(F.expr("sequence(1, 50 - cast(id as int))")).alias("_"),
        F.concat(F.lit("item-"), F.col("id")).alias("k")).select("k")


def test_never_underestimates(spark, items):
    est = {r["k"]: r["est"]
           for r in cms_counts(items, "k", DEPTH, WIDTH).collect()}
    true = {r["k"]: r["n"] for r in
            items.groupBy("k").agg(F.count("*").alias("n")).collect()}
    assert set(est) == set(true)
    assert all(est[k] >= true[k] for k in true)
    # width 16 over 50 keys must actually collide somewhere
    assert any(est[k] > true[k] for k in true)


def test_sketch_is_bounded(spark, items):
    sk = count_min_sketch(items, "k", DEPTH, WIDTH)
    assert sk.count() <= DEPTH * WIDTH
    assert sk.groupBy("r").count().count() == DEPTH


def test_merge_equals_whole(spark, items):
    # deterministic split via a keyed rank; merged halves == whole
    ranked = items.withColumn(
        "rn", F.row_number().over(Window.orderBy("k")))
    a = ranked.filter("rn <= 600").select("k")
    b = ranked.filter("rn > 600").select("k")
    merged = cms_merge(count_min_sketch(a, "k", DEPTH, WIDTH),
                       count_min_sketch(b, "k", DEPTH, WIDTH))
    whole = count_min_sketch(items, "k", DEPTH, WIDTH)
    ms = {(r["r"], r["b"]): r["cnt"] for r in merged.collect()}
    ws = {(r["r"], r["b"]): r["cnt"] for r in whole.collect()}
    assert ms == ws


def test_weighted_counts(spark):
    df = spark.createDataFrame(
        [("a", 3), ("a", 2), ("b", 7)], "k string, w long")
    sk = count_min_sketch(df, "k", DEPTH, WIDTH, weight_col="w")
    est = {r["k"]: r["est"] for r in cms_estimate(
        sk, df.select("k").distinct(), "k", DEPTH, WIDTH).collect()}
    assert est["a"] >= 5 and est["b"] >= 7
