"""Global rank / CDF normalization without a global sort.

Corpus filters are usually specified as percentiles ("drop the bottom
quartile by quality"), which needs every row's GLOBAL rank — and the
naive ``percent_rank() OVER (ORDER BY score)`` is a single-reducer
total sort, the textbook scale-killer.

Same two-phase trick as ``operators/mixing.py``: quantize the score to
a bounded number of ORDER-ALIGNED buckets (numeric truncation is
monotone, so bucket order == score order), count per bucket (one
narrow partial-agg shuffle), turn the tiny per-bucket counts into
rank offsets with a window over ≤``n_buckets`` rows, broadcast the
offsets back, and rank locally within each bucket.  The widest sort
any reducer performs is one bucket, not the corpus.

The rank is row_number-based with the id as tiebreak (deterministic,
oracle-checkable): ``pct = (rank - 1) / (n - 1)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def global_percent_rank(df: DataFrame, score: Column,
                        id_col: str = "doc_id",
                        bucket_width: float = 0.001) -> DataFrame:
    """Every row's global CDF position by ``score``.

    Returns ``(id_col, score, pct)`` with ``pct`` in [0, 1]:
    ``(global_rank - 1) / (n - 1)`` under (score, id) order, rounded to
    6 dp.  ``bucket_width`` quantizes the score into the parallel
    ranking buckets; any width works (correctness is exact — buckets
    only partition the sort), smaller widths = more parallelism.

    NULL scores have no rank position and would otherwise vanish
    silently through the bucket join, so they are rejected up front.
    A 1-row input yields ``pct = 0.0`` (the sole row is the whole CDF)
    rather than NULL from the 0/0 division.
    """
    # fail in-plan (no extra driver job) the moment a NULL score is
    # scanned, instead of silently dropping the row at the bucket join
    checked = F.when(
        score.isNull(),
        F.raise_error(F.lit(
            "global_percent_rank: NULL score has no CDF position; filter "
            "or coalesce before ranking"))).otherwise(score)
    scored = df.select(F.col(id_col), checked.alias("__s__"),
                       F.floor(checked / F.lit(bucket_width))
                       .cast("long").alias("__b__"))

    counts = scored.groupBy("__b__").agg(F.count(F.lit(1)).alias("__c__"))
    offsets = counts.select(
        "__b__",
        F.coalesce(
            F.sum("__c__").over(
                W.orderBy("__b__").rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)).alias("__off__"),
        F.sum("__c__").over(
            W.orderBy("__b__").rowsBetween(W.unboundedPreceding,
                                           W.unboundedFollowing))
        .alias("__n__"))

    local = F.row_number().over(
        W.partitionBy("__b__").orderBy("__s__", id_col))
    return (scored.join(F.broadcast(offsets), on="__b__")
            .select(id_col, F.col("__s__").alias("score"),
                    F.when(F.col("__n__") == 1, F.lit(0.0))
                    .otherwise(F.round((F.col("__off__") + local - 1)
                                       / (F.col("__n__") - 1), 6))
                    .alias("pct")))
