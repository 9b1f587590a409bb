"""Tolerance-based checks for approximate operators (SURVEY.md §7 risk
3: different sketches than the reference — equal contracts, different
exact outputs, so these compare against exact answers with the
documented error bounds instead of hashes)."""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SF = "/root/testdata/sf0.01"


def test_approx_quantiles_within_epsilon(spark):
    """percentile_approx (GK sketch, accuracy=1e4 default) vs exact
    quantiles: rank error <= eps * n."""
    li = spark.read.parquet(f"{SF}/lineitem.parquet")
    probs = [0.25, 0.5, 0.75, 0.95]
    approx = li.select(
        F.percentile_approx("l_extendedprice", probs, 10000).alias("q")
    ).first()["q"]
    exact = (duckdb.connect().execute(
        f"""SELECT quantile_cont(l_extendedprice, {probs})
            FROM read_parquet('{SF}/lineitem.parquet')""").fetchone()[0])
    lo, hi = (duckdb.connect().execute(
        f"""SELECT min(l_extendedprice), max(l_extendedprice)
            FROM read_parquet('{SF}/lineitem.parquet')""").fetchone())
    spread = hi - lo
    for a, e in zip(approx, exact):
        # value-space sanity bound: within 5% of the full spread
        assert abs(a - e) <= 0.05 * spread, f"{a} vs {e}"


def test_approx_count_distinct_within_rsd(spark):
    """approx_count_distinct (HLL++) vs exact, rsd=0.05 default ->
    allow 3 sigma."""
    from apache_beam_spark.sources.tables import load_table

    ev = load_table(spark, "events", SF)
    approx = ev.select(F.approx_count_distinct("user_id", 0.05).alias("n")).first()["n"]
    exact = ev.select(F.countDistinct("user_id").alias("n")).first()["n"]
    assert abs(approx - exact) <= 3 * 0.05 * exact, f"{approx} vs {exact}"
