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


# --- HyperLogLog (operators/sketches.py) ------------------------------

from apache_beam_spark.operators.sketches import (  # noqa: E402
    hll_distinct, hll_estimate, hll_merge, hll_sketch)

P = 8  # m = 256 registers


def test_hll_accuracy_and_multiplicity_invariance(spark):
    # 2000 distinct ids, each duplicated 3x: the estimate must track
    # DISTINCT cardinality (multiplicity-invariant) within the m=256
    # error envelope (1.04/sqrt(256) ~ 6.5%; assert 4 sigma).
    base = spark.range(2000).select(F.col("id").alias("v"))
    dup = base.union(base).union(base)
    est = hll_distinct(dup, "v", p=P).collect()[0]["est_distinct"]
    est_once = hll_distinct(base, "v", p=P).collect()[0]["est_distinct"]
    assert est == est_once
    assert abs(est - 2000) / 2000 < 0.26


def test_hll_linear_counting_small_cardinality(spark):
    # 50 distinct into 256 registers: linear-counting branch, which is
    # very accurate at this load factor.
    df = spark.range(50).select(F.col("id").alias("v"))
    row = hll_distinct(df, "v", p=P).collect()[0]
    assert row["n_registers"] <= 50
    assert abs(row["est_distinct"] - 50) / 50 < 0.10


def test_hll_merge_equals_whole_and_idempotent(spark):
    df = spark.range(3000).select(F.col("id").alias("v"))
    a = df.filter("v % 2 = 0")
    b = df.filter("v % 2 = 1")
    c = df.filter("v >= 1000")  # overlaps b+a: tests idempotence too
    merged = hll_merge(hll_sketch(a, "v", p=P), hll_sketch(b, "v", p=P),
                       hll_sketch(c, "v", p=P))
    whole = hll_sketch(df, "v", p=P)
    ms = {r["bucket"]: r["rho"] for r in merged.collect()}
    ws = {r["bucket"]: r["rho"] for r in whole.collect()}
    assert ms == ws
    twice = hll_merge(whole, whole)
    assert {r["bucket"]: r["rho"] for r in twice.collect()} == ws


def test_hll_bounded_and_per_key(spark):
    df = spark.range(5000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        F.col("id").alias("v"))
    sk = hll_sketch(df, "v", p=P, key_cols=["g"])
    assert sk.count() <= 3 * (1 << P)
    out = {r["g"]: r["est_distinct"]
           for r in hll_estimate(sk, p=P).collect()}
    assert set(out) == {"0", "1", "2"}
    # ~1667 distinct per key; 4-sigma envelope at m=256
    assert all(abs(v - 5000 / 3) / (5000 / 3) < 0.26
               for v in out.values())


# --- KMV set-algebra sketch (operators/sketches.py) -------------------

from apache_beam_spark.operators.sketches import (  # noqa: E402
    kmv_estimate, kmv_overlap, kmv_sketch)


def test_kmv_exact_below_k(spark):
    df = spark.range(40).select(F.col("id").alias("v"))
    assert kmv_sketch(df, "v", k=64).count() == 40
    est = kmv_estimate(kmv_sketch(df, "v", k=64), k=64) \
        .collect()[0]["est_distinct"]
    assert est == 40.0


def test_kmv_estimator_accuracy(spark):
    # 2000 distinct at k=256: sigma ~ 1/sqrt(k-1) ~ 6.3%; assert 4 sigma
    df = spark.range(2000).select(F.col("id").alias("v"))
    est = kmv_estimate(kmv_sketch(df, "v", k=256), k=256) \
        .collect()[0]["est_distinct"]
    assert abs(est - 2000) / 2000 < 0.26


def test_kmv_sketch_bounded_and_multiplicity_invariant(spark):
    base = spark.range(5000).select(
        (F.col("id") % 2).cast("string").alias("g"),
        F.col("id").alias("v"))
    dup = base.union(base)
    s1 = {(r["g"], r["h"]) for r in
          kmv_sketch(base, "v", k=32, key_cols=["g"]).collect()}
    s2 = {(r["g"], r["h"]) for r in
          kmv_sketch(dup, "v", k=32, key_cols=["g"]).collect()}
    assert s1 == s2
    assert len(s1) == 2 * 32


def test_kmv_overlap_known_jaccard(spark):
    # A = 0..999, B = 500..1499: J = 1/3, |A cap B| = 500
    a = spark.range(0, 1000).select(F.lit("A").alias("g"),
                                    F.col("id").alias("v"))
    b = spark.range(500, 1500).select(F.lit("B").alias("g"),
                                      F.col("id").alias("v"))
    row = kmv_overlap(a.union(b), "v", "g", k=128).collect()[0]
    assert (row["set_a"], row["set_b"]) == ("A", "B")
    assert abs(row["est_jaccard"] - 1 / 3) < 0.17
    assert abs(row["est_common"] - 500) / 500 < 0.45


def test_kmv_overlap_exact_when_small(spark):
    a = spark.range(0, 20).select(F.lit("A").alias("g"),
                                  F.col("id").alias("v"))
    b = spark.range(10, 30).select(F.lit("B").alias("g"),
                                   F.col("id").alias("v"))
    row = kmv_overlap(a.union(b), "v", "g", k=64).collect()[0]
    assert row["est_common"] == 10.0
    assert row["est_jaccard"] == round(10 / 30, 4)


# --- histogram quantile sketch (operators/sketches.py) -----------------

from apache_beam_spark.operators.sketches import (  # noqa: E402
    hist_merge, hist_quantiles, hist_quantiles_of, hist_sketch)

LO, HI, BINS = 0.0, 1024.0, 16  # width 64, exact double


def test_hist_sketch_bounded_and_clamped(spark):
    # values outside [lo, hi) clamp into the edge bins, never drop
    df = spark.createDataFrame(
        [(-50.0,), (0.0,), (63.9,), (64.0,), (5000.0,), (1023.9,)],
        "v double")
    sk = hist_sketch(df, "v", LO, HI, BINS)
    rows = {r["bin"]: r["cnt"] for r in sk.collect()}
    assert sum(rows.values()) == 6          # nothing dropped
    assert rows[0] == 3                     # -50, 0, 63.9 all in bin 0
    assert rows[1] == 1                     # 64.0
    assert rows[BINS - 1] == 2              # 5000 clamps, 1023.9 lands
    assert sk.count() <= BINS


def test_hist_merge_equals_whole(spark):
    df = spark.range(500).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") * 2).cast("double").alias("v"))
    a = df.filter("id % 2 = 0")
    b = df.filter("id % 2 = 1")
    merged = hist_merge(hist_sketch(a, "v", LO, HI, BINS, ["g"]),
                        hist_sketch(b, "v", LO, HI, BINS, ["g"]))
    whole = hist_sketch(df, "v", LO, HI, BINS, ["g"])
    ms = {(r["g"], r["bin"]): r["cnt"] for r in merged.collect()}
    ws = {(r["g"], r["bin"]): r["cnt"] for r in whole.collect()}
    assert ms == ws


def test_hist_quantiles_interpolation_pinned(spark):
    # 64 values 0..63, all in bin 0 (width 64): q=0.5 -> r=32,
    # est = 0 + 64 * 32/64 = 32.0 exactly; q=0.25 -> 16.0
    df = spark.range(64).select(F.col("id").cast("double").alias("v"))
    out = {r["q"]: r["est_value"] for r in hist_quantiles_of(
        df, "v", [0.25, 0.5, 1.0], LO, HI, BINS).collect()}
    assert out[0.25] == 16.0
    assert out[0.5] == 32.0
    assert out[1.0] == 64.0                 # r=64, top of bin 0


def test_hist_quantiles_spans_bins_per_key(spark):
    # uniform 0..1023 per key: median ~512, p0.25 ~256 (within a bin)
    df = spark.range(2048).select(
        (F.col("id") % 2).cast("string").alias("g"),
        (F.col("id") / 2).cast("double").alias("v"))
    out = {(r["g"], r["q"]): r["est_value"] for r in hist_quantiles(
        hist_sketch(df, "v", LO, HI, BINS, ["g"]),
        [0.25, 0.5], LO, HI, BINS).collect()}
    for g in ("0", "1"):
        assert abs(out[(g, 0.25)] - 256.0) <= 64.0
        assert abs(out[(g, 0.5)] - 512.0) <= 64.0


def test_kmv_unkeyed_preprune_matches_keyed_constant(spark):
    # the two-stage unkeyed path (per-partition bottom-k pre-prune)
    # must produce the exact global bottom-k: compare against the
    # keyed path with a constant key, whose single window is the
    # straightforward definition
    df = spark.range(5000).select(F.col("id").alias("v")).repartition(8)
    unkeyed = sorted(r["h"] for r in kmv_sketch(df, "v", k=64).collect())
    keyed = sorted(r["h"] for r in kmv_sketch(
        df.withColumn("g", F.lit("x")), "v", k=64,
        key_cols=["g"]).collect())
    assert unkeyed == keyed
    assert len(unkeyed) == 64
