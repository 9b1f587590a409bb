"""dedup/fuzzy.py: symmetric-delete completeness vs brute force,
edit-kind coverage (sub/ins/del), k=2, and empty-string safety."""

from __future__ import annotations

import itertools
import random

from pyspark.sql import functions as F

from apache_beam_spark.dedup.fuzzy import (deletion_neighborhood,
                                           fuzzy_self_join)


def _brute(names, k):
    def lev(a, b):
        m, n = len(a), len(b)
        d = list(range(n + 1))
        for i in range(1, m + 1):
            prev, d[0] = d[0], i
            for j in range(1, n + 1):
                prev, d[j] = d[j], min(d[j] + 1, d[j - 1] + 1,
                                       prev + (a[i - 1] != b[j - 1]))
        return d[n]

    return sorted((i, j, lev(a, b))
                  for (i, a), (j, b) in
                  itertools.combinations(enumerate(names), 2)
                  if lev(a, b) <= k)


def _run(spark, names, k):
    df = spark.createDataFrame(list(enumerate(names)),
                               "id bigint, name string")
    got = fuzzy_self_join(df, "id", "name", max_dist=k)
    return sorted((r["id_a"], r["id_b"], r["dist"])
                  for r in got.collect())


def test_edit_kinds_k1(spark):
    names = ["market", "marke",        # deletion
             "marketx",                # insertion (vs market)
             "narket",                 # substitution
             "tekram",                 # far
             ""]                       # empty string safety
    assert _run(spark, names, 1) == _brute(names, 1)


def test_random_corpus_matches_brute_force_k1_k2(spark):
    rng = random.Random(3)
    base = ["".join(rng.choice("abc") for _ in range(rng.randint(3, 8)))
            for _ in range(40)]
    for k in (1, 2):
        assert _run(spark, base, k) == _brute(base, k)


def test_neighborhood_contains_self_and_deletions(spark):
    df = spark.createDataFrame([("abc",)], "s string")
    got = sorted(df.select(
        F.explode(deletion_neighborhood(F.col("s"), 1)).alias("v"))
        .toPandas()["v"])
    assert got == ["ab", "abc", "ac", "bc"]
