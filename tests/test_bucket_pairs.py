"""Shared LSH bucket-pair discipline (dedup/buckets.py — VERDICT r3
item 1): the chunked triangle split must equal the naive all-pairs
expansion for EVERY bucket width, over-cap ones included."""

from __future__ import annotations

import itertools
import random

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.dedup.buckets import bucket_pairs


def _naive(rows):
    by_bucket = {}
    for bucket, i in rows:
        by_bucket.setdefault(bucket, set()).add(i)
    out = set()
    for ids in by_bucket.values():
        out |= {tuple(sorted(p)) for p in itertools.combinations(ids, 2)}
    return sorted(out)


@pytest.mark.parametrize("max_bucket", [2, 3, 7, 100])
def test_bucket_pairs_equals_naive(spark, max_bucket):
    rng = random.Random(11)
    # widths 1 (no pairs), cap-1, cap, cap+1, several chunks, ragged tail
    widths = [1, max_bucket - 1, max_bucket, max_bucket + 1,
              3 * max_bucket, 3 * max_bucket + 1]
    rows, nxt = [], 0
    for b, w in enumerate(widths):
        ids = list(range(nxt, nxt + max(1, w)))
        nxt += len(ids) + rng.randrange(5)
        rows += [(b, i) for i in ids]
        rows += [(b, i) for i in ids[:2]]   # duplicate occurrences collapse
    df = spark.createDataFrame(rows, "bucket int, id long")
    got = sorted(map(tuple, bucket_pairs(df, ["bucket"], max_bucket=max_bucket)
                     .select("id_a", "id_b").collect()))
    assert got == _naive(rows)


def test_bucket_pairs_multi_key_and_overlap(spark):
    """Composite bucket keys; ids shared across buckets dedupe to one
    pair row (the distinct contract)."""
    rows = [(0, 0, i) for i in range(12)] + [(0, 1, i) for i in range(6, 20)]
    df = spark.createDataFrame(rows, "band int, bh int, id long")
    got = sorted(map(tuple, bucket_pairs(df, ["band", "bh"], max_bucket=5)
                     .select("id_a", "id_b").collect()))
    want = _naive([((b, h), i) for b, h, i in rows])
    assert got == want
    assert len(got) == len(set(got))


def test_bucket_pairs_observation_counters(spark):
    from pyspark.sql import Observation

    rows = [(0, i) for i in range(30)] + [(1, 100 + i) for i in range(3)]
    df = spark.createDataFrame(rows, "bucket int, id long")
    obs = Observation("bp")
    out = bucket_pairs(df, ["bucket"], max_bucket=10, observation=obs)
    assert out.count() == 435 + 3
    m = obs.get
    assert m["n_buckets"] == 2
    assert m["overcap_buckets"] == 1
    assert m["max_bucket_width"] == 30
    assert m["overcap_candidates"] == 435.0


def test_bucket_pairs_rejects_degenerate_cap(spark):
    df = spark.createDataFrame([(0, 1)], "bucket int, id long")
    with pytest.raises(ValueError, match="max_bucket"):
        bucket_pairs(df, ["bucket"], max_bucket=1)


def test_bucket_pairs_overcap_plan_repartitions(spark):
    """The over-cap branch must hash-repartition chunk pairs before the
    pair explode — that exchange is what spreads one degenerate
    bucket's O(w^2) work across tasks."""
    from apache_beam_spark.plans import plan_string

    df = spark.createDataFrame([(0, i) for i in range(30)],
                               "bucket int, id long")
    plan = plan_string(bucket_pairs(df, ["bucket"], max_bucket=10))
    assert "hashpartitioning(bucket" in plan.replace(" ", "").lower() or \
        "hashpartitioning" in plan
    assert "CartesianProduct" not in plan
