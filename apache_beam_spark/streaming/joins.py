"""Unbounded (stream-stream) joins.

Reference: the unbounded CoGBK/join family (SURVEY.md §2.4) — per-window
join state the reference built from GroupAlsoByWindow machinery.  Spark
buffers both sides in the state store and evicts by watermark, which
needs (a) watermarks on BOTH sides and (b) an event-time range bound in
the join condition so state is provably finite.  This wrapper enforces
both and builds the canonical key + time-range condition.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(left: DataFrame, right: DataFrame, on: str,
                  left_ts: str, right_ts: str,
                  lower: str = "0 seconds", upper: str = "1 hour",
                  watermark_delay: str = "10 minutes",
                  how: str = "inner") -> DataFrame:
    """Join stream rows with ``right_ts - left_ts`` in [lower, upper]
    and equal ``on`` keys.  Watermarks are applied here (both sides,
    same delay) so the state bound is part of the operator contract —
    a missing watermark would make Spark buffer state forever.

    ``how``: inner, or left/right/full outer (Spark emits null-extended
    rows once the watermark proves no match can arrive).  Column names
    other than ``on`` must be disjoint.
    """
    overlap = set(left.columns) & set(right.columns) - {on}
    if overlap:
        raise ValueError(f"interval_join: ambiguous columns {sorted(overlap)}; "
                         "rename one side first")
    from apache_beam_spark.windowing import ensure_event_time

    l = ensure_event_time(left, left_ts).withWatermark(left_ts, watermark_delay)
    r = (ensure_event_time(right, right_ts)
         .withWatermark(right_ts, watermark_delay)
         .withColumnRenamed(on, "__rk__"))
    cond = (
        (l[on] == r["__rk__"])
        & (r[right_ts] >= l[left_ts] + F.expr(f"INTERVAL {lower}"))
        & (r[right_ts] <= l[left_ts] + F.expr(f"INTERVAL {upper}"))
    )
    return l.join(r, cond, how).drop("__rk__")
