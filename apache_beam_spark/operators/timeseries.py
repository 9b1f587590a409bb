"""Time-series regularization operators.

The reference has no native time-series surface (its analogue is a
windowed GroupByKey producing the SPARSE buckets); a real analytics
engine needs the densification step too — the classic
gaps-and-interpolation pass that turns per-key sparse event buckets
into a dense, model-ready series.

100 TB design: everything is per-key relational — one aggregate for
the key bounds, one `sequence()` explode bounded by span/step, one
(key, bucket) equi-join, and one per-key window sort.  No driver-side
loops, no UDFs; the dense grid never exceeds sum over keys of
span/step rows, and keys partition independently (repartition by key
upstream for skewed spans).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def gap_fill_linear(df: DataFrame, key: str, bucket_col: str,
                    value_col: str, step: int = 1) -> DataFrame:
    """Densify a sparse integer series and LINEARLY interpolate gaps.

    ``df`` holds one row per observed (key, bucket) with an integer
    ``value_col``; buckets are integers on a ``step`` grid (epoch
    hours, days, ...).  Output: one row per (key, bucket) for EVERY
    grid point between the key's first and last observation, with

    * observed rows passed through (``is_gap = 0``);
    * gap rows interpolated with the INTEGER lerp
      ``prev + floor((next - prev) * (t - prev_t) / (next_t - prev_t))``
      (``is_gap = 1``) — floor of an exact small-int product, so the
      result is engine-independent (pinned by the `timeseries_gapfill`
      oracle, which computes the identical formula in SQL).

    Edge buckets are observations by construction (the grid spans
    min..max of the key's own data), so every gap has both neighbors.

    Contract guard: every observed bucket must sit ON the step grid
    anchored at the key's min bucket — a misaligned row would miss the
    grid equi-join and be silently interpolated across, so it raises
    instead (checked in the data path via ``raise_error``).
    """
    w_key = W.partitionBy(key)
    aligned = ((F.col(bucket_col) - F.min(bucket_col).over(w_key))
               % step == 0)
    guard = F.when(aligned, F.col(value_col)).otherwise(F.raise_error(
        F.concat(F.lit("gap_fill_linear: bucket "),
                 F.col(bucket_col).cast("string"),
                 F.lit(f" is not aligned to the step-{step} grid of its"
                       " key (misaligned observations would be silently"
                       " lost; re-bucket the input)"))))
    df = df.select(key, bucket_col, guard.cast("bigint").alias(value_col))
    bounds = df.groupBy(key).agg(F.min(bucket_col).alias("_mn"),
                                 F.max(bucket_col).alias("_mx"))
    grid = bounds.select(
        key, F.explode(F.sequence("_mn", "_mx", F.lit(step)))
        .alias(bucket_col))
    j = grid.join(df, [key, bucket_col], "left")

    w_prev = (W.partitionBy(key).orderBy(bucket_col)
              .rowsBetween(W.unboundedPreceding, 0))
    w_next = (W.partitionBy(key).orderBy(bucket_col)
              .rowsBetween(0, W.unboundedFollowing))
    obs_bucket = F.when(F.col(value_col).isNotNull(), F.col(bucket_col))
    pv = F.last(value_col, ignorenulls=True).over(w_prev)
    pt = F.last(obs_bucket, ignorenulls=True).over(w_prev)
    nv = F.first(value_col, ignorenulls=True).over(w_next)
    nt = F.first(obs_bucket, ignorenulls=True).over(w_next)
    lerp = pv + F.floor(
        ((nv - pv) * (F.col(bucket_col) - pt)).cast("double") / (nt - pt))
    filled = F.when(F.col(value_col).isNotNull(), F.col(value_col)) \
        .otherwise(lerp)
    return j.select(
        key, bucket_col,
        filled.cast("bigint").alias(value_col),
        F.col(value_col).isNull().cast("int").alias("is_gap"))
