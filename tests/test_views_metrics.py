"""Side-input views (View.java contracts) and user metrics."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.metrics import Counter, distribution, observe_metrics
from apache_beam_spark.operators.views import View


def test_as_singleton(spark):
    one = spark.createDataFrame([(42,)], ["v"])
    assert View.as_singleton(one) == 42
    empty = one.filter("v < 0")
    assert View.as_singleton(empty, default=7) == 7
    with pytest.raises(ValueError, match="empty"):
        View.as_singleton(empty)
    many = spark.createDataFrame([(1,), (2,)], ["v"])
    with pytest.raises(ValueError, match=">1"):
        View.as_singleton(many)


def test_as_list_map_multimap(spark):
    df = spark.createDataFrame([("a", 1), ("b", 2)], ["k", "v"])
    assert sorted(View.as_list(df.select("k"))) == ["a", "b"]
    assert View.as_map(df) == {"a": 1, "b": 2}
    dup = spark.createDataFrame([("a", 1), ("a", 2)], ["k", "v"])
    with pytest.raises(ValueError, match="duplicate key"):
        View.as_map(dup)
    assert View.as_multimap(dup) == {"a": [1, 2]}


def test_side_input_in_closure(spark):
    """The reference's side-input join pattern (GameStats.java:122-142):
    a small map view consumed inside per-element logic."""
    rates = View.as_map(spark.createDataFrame(
        [("EUR", 1.1), ("GBP", 1.3)], ["ccy", "rate"]))
    df = spark.createDataFrame([("EUR", 100.0), ("GBP", 200.0)], ["ccy", "amt"])
    mapping = F.create_map(*[F.lit(x) for kv in rates.items() for x in kv])
    out = {r["ccy"]: r["usd"] for r in
           df.select("ccy", (F.col("amt") * mapping[F.col("ccy")]).alias("usd")).collect()}
    assert out == {"EUR": pytest.approx(110.0), "GBP": pytest.approx(260.0)}


def test_observe_metrics_batch(spark):
    df = spark.createDataFrame([(i,) for i in range(10)], ["v"])
    observed, handle = observe_metrics(
        df, "m", F.count(F.lit(1)).alias("n"), *distribution("v", "v"))
    assert observed.count() == 10
    got = handle.get()
    assert got["n"] == 10 and got["v_min"] == 0 and got["v_max"] == 9
    assert got["v_sum"] == 45 and got["v_count"] == 10


def test_counter_in_python_path(spark):
    c = Counter(spark, "test", "rows_seen")

    def fn(batches):
        for pdf in batches:
            c.inc(len(pdf))
            yield pdf

    df = spark.createDataFrame([(i,) for i in range(25)], ["v"])
    assert df.mapInPandas(fn, "v bigint").count() == 25
    assert c.value == 25
