"""Heavy hitters: Misra-Gries candidates + exact verify pass.

Laws checked:
- candidate containment: every item with freq > n/(capacity+1) appears
  in the candidate set, for random streams and tiny capacities;
- heavy_hitters == the exact SQL answer (threshold on exact counts);
- partition invariance: same result at 1, 7, and 32 partitions;
- approx_top_k == exact top-k on Zipf-ish data with adequate capacity;
- the exact-count join broadcasts (no full-stream shuffle on the
  candidate side).
"""

from __future__ import annotations

import collections
import random

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st
from pyspark.sql import functions as F

from apache_beam_spark.operators.heavy_hitters import (
    approx_top_k, heavy_hitters, misra_gries_candidates,
)


def _zipf_items(n=20000, n_items=1000, seed=7):
    rng = random.Random(seed)
    # ~Zipf: item i with weight 1/(i+1)
    weights = [1.0 / (i + 1) for i in range(n_items)]
    return rng.choices(range(n_items), weights=weights, k=n)


def _exact(items, capacity):
    n = len(items)
    c = collections.Counter(items)
    return {k: v for k, v in c.items() if v * (capacity + 1) > n}


def test_heavy_hitters_matches_exact_zipf(spark):
    items = _zipf_items()
    df = spark.createDataFrame([(i,) for i in items], "item long")
    got = {(r["item"], r["freq"])
           for r in heavy_hitters(df, "item", capacity=30).collect()}
    want = set(_exact(items, 30).items())
    assert got == want
    assert got  # non-degenerate: Zipf head must clear the threshold


@pytest.mark.parametrize("parts", [1, 7, 32])
def test_partition_invariance(spark, parts):
    items = _zipf_items(n=5000, n_items=200, seed=11)
    df = spark.createDataFrame([(i,) for i in items], "item long") \
        .repartition(parts)
    got = {(r["item"], r["freq"])
           for r in heavy_hitters(df, "item", capacity=20).collect()}
    assert got == set(_exact(items, 20).items())


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(items=st.lists(st.integers(0, 30), min_size=1, max_size=300),
       capacity=st.integers(1, 8))
def test_candidate_containment_law(spark, items, capacity):
    df = spark.createDataFrame([(i,) for i in items], "item long") \
        .repartition(4)
    cands = {r["item"]
             for r in misra_gries_candidates(df, "item", capacity).collect()}
    n = len(items)
    heavy = {k for k, v in collections.Counter(items).items()
             if v * (capacity + 1) > n}
    assert heavy <= cands


def test_approx_top_k_matches_exact(spark):
    items = _zipf_items(n=30000, n_items=2000, seed=3)
    df = spark.createDataFrame([(i,) for i in items], "item long")
    got = [(r["item"], r["freq"])
           for r in approx_top_k(df, "item", k=10, capacity=200).collect()]
    c = collections.Counter(items)
    want = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert got == want


def test_strings_and_null_items(spark):
    df = spark.createDataFrame(
        [("a",)] * 50 + [("b",)] * 30 + [(None,)] * 10 + [("c",)] * 2,
        "item string")
    got = {(r["item"], r["freq"])
           for r in heavy_hitters(df, "item", capacity=3).collect()}
    # n=82 non-null items; threshold 82/4=20.5
    assert got == {("a", 50), ("b", 30)}


def test_exact_pass_broadcasts(spark):
    items = _zipf_items(n=2000, n_items=100, seed=5)
    df = spark.createDataFrame([(i,) for i in items], "item long")
    plan = heavy_hitters(df, "item", capacity=10)._jdf \
        .queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
