"""Heavy hitters / approximate top-k without shuffling the full stream.

The naive plan — ``groupBy(item).count()`` then filter or top-k —
shuffles one record per input row.  At 100 TB the item stream (e.g.
every token of every document) dwarfs the answer by many orders of
magnitude.  This operator instead:

1. runs a Misra-Gries summary of ``capacity`` counters inside each
   partition (``mapInPandas``, vectorized per Arrow batch: the batch is
   pre-aggregated with ``value_counts`` and merged into the running
   summary, then trimmed back to capacity by subtracting the
   (capacity+1)-th largest count — the mergeable-summaries trim of
   Agarwal et al., which preserves the n/(capacity+1) error bound);
2. unions the per-partition candidate sets (≤ capacity rows per
   partition — kilobytes, not terabytes);
3. broadcast-semi-joins the input against the candidates and exact-counts
   only the matching rows — the single shuffle carries heavy items only.

Guarantee: any item with true frequency > n/(capacity+1) exceeds that
threshold in at least one partition (pigeonhole over the partition
totals), so it survives that partition's summary; the exact-count pass
then makes the final output deterministic — identical to what a full
exact ``GROUP BY`` would return under the same threshold/top-k, and
therefore oracle-checkable against plain SQL.

Reference semantics: Beam's ``Top.largestPerKey`` / ``Count`` composed
with a threshold (sdks/java/core/.../transforms/Top.java:~70); the
sketch stage is the scalable substitute Beam users reach for via
``ApproximateUnique``-style transforms.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def misra_gries_candidates(df: DataFrame, item_col: str,
                           capacity: int = 50) -> DataFrame:
    """Per-partition Misra-Gries summaries, unioned: a DataFrame with a
    single ``item_col`` column of ≤ capacity × n_partitions candidate
    rows guaranteed to contain every item with global frequency
    > n/(capacity+1)."""
    item_type = df.schema[item_col].dataType.simpleString()

    def summarize(batches):
        import pandas as pd

        counters: dict = {}
        for pdf in batches:
            for item, c in pdf[item_col].value_counts().items():
                counters[item] = counters.get(item, 0) + int(c)
            if len(counters) > capacity:
                # mergeable-summaries trim: subtract the (capacity+1)-th
                # largest count from everything, drop the non-positive
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {k: v - cut for k, v in counters.items()
                            if v - cut > 0}
        yield pd.DataFrame({item_col: list(counters.keys())})

    src = df.select(item_col).filter(F.col(item_col).isNotNull())
    return (src.mapInPandas(summarize, schema=f"{item_col} {item_type}")
            .distinct())


def heavy_hitters(df: DataFrame, item_col: str,
                  capacity: int = 50) -> DataFrame:
    """All items with exact frequency > n/(capacity+1), with their exact
    counts: DataFrame(item_col, freq).  Deterministic (sketch only
    prunes the candidate space; the output is exact)."""
    cands = misra_gries_candidates(df, item_col, capacity)
    src = df.select(item_col).filter(F.col(item_col).isNotNull())
    exact = (src.join(F.broadcast(cands), on=item_col)
             .groupBy(item_col).agg(F.count(F.lit(1)).alias("freq")))
    total = src.agg(F.count(F.lit(1)).alias("__n__"))
    return (exact.crossJoin(F.broadcast(total))
            .filter(F.col("freq") * (capacity + 1) > F.col("__n__"))
            .drop("__n__"))


def approx_top_k(df: DataFrame, item_col: str, k: int = 10,
                 capacity: int = 200) -> DataFrame:
    """Top-k items by exact frequency among the Misra-Gries candidates,
    deterministic tiebreak on the item value: DataFrame(item_col, freq).

    Exact whenever the true k-th frequency exceeds n/(capacity+1) —
    size ``capacity`` accordingly (a few × k for Zipf-ish data)."""
    cands = misra_gries_candidates(df, item_col, capacity)
    src = df.select(item_col).filter(F.col(item_col).isNotNull())
    exact = (src.join(F.broadcast(cands), on=item_col)
             .groupBy(item_col).agg(F.count(F.lit(1)).alias("freq")))
    return (exact
            .orderBy(F.col("freq").desc(), F.col(item_col))
            .limit(k))
