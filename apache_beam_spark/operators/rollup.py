"""Multi-resolution windowed rollup (hypertable-style continuous
aggregate cascade).

Not in the reference (its windows are single-resolution) — added as a
training-pipeline op: metrics pipelines need the same aggregate at
minute/hour/day grain, and the cascade computes each coarser level from
the previous one instead of rescanning the raw table.  At 100 TB that
turns N full scans into one scan + N-1 tiny re-aggregations, and every
level is a plain windowed aggregate (streamable with a watermark).

Only decomposable aggregates are allowed (sum/count/min/max — count
re-aggregates as sum), the same restriction continuous aggregates have
everywhere.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MERGE = {"sum": F.sum, "count": F.sum, "min": F.min, "max": F.max}
_FIRST = {"sum": F.sum, "count": lambda c: F.count(F.lit(1)), "min": F.min, "max": F.max}


def rollup_windows(df: DataFrame, event_time: str, keys: Sequence[str],
                   aggs: dict[str, str], levels: Sequence[str]) -> dict[str, DataFrame]:
    """``aggs``: {output_col: "sum:src" | "count" | "min:src" | "max:src"}.
    ``levels``: window sizes finest-first, each evenly divisible into
    the next (e.g. ["1 hour", "1 day"]).  Returns {level: DataFrame}
    with columns (window, *keys, *aggs)."""
    parsed = {}
    for out_col, spec in aggs.items():
        kind, _, src = spec.partition(":")
        if kind not in _MERGE:
            raise ValueError(f"non-decomposable aggregate: {kind}")
        parsed[out_col] = (kind, src or None)

    first = [
        (_FIRST[kind](src) if src else _FIRST[kind](None)).alias(out_col)
        for out_col, (kind, src) in parsed.items()
    ]
    cur = df.groupBy(F.window(F.col(event_time), levels[0]).alias("window"), *keys) \
        .agg(*first)
    out = {levels[0]: cur}
    for lvl in levels[1:]:
        merge = [_MERGE[kind](out_col).alias(out_col)
                 for out_col, (kind, _) in parsed.items()]
        # streaming: window-of-window keeps the event-time watermark
        # attached through the chained stateful aggregations (Spark's
        # multiple-stateful-operator support); batch: plain re-window
        # on the start timestamp (identical result)
        coarser = (F.window(F.col("window"), lvl) if df.isStreaming
                   else F.window(F.col("window.start"), lvl))
        cur = cur.groupBy(coarser.alias("window"), *keys).agg(*merge)
        out[lvl] = cur
    return out


def merge_rollups(existing: DataFrame, delta: DataFrame,
                  keys: Sequence[str],
                  aggs: dict[str, str]) -> DataFrame:
    """Incremental continuous-aggregate refresh: fold a DELTA rollup
    (new raw partition, same grain) into an EXISTING rollup without
    rescanning history — union + one keyed re-aggregation using each
    metric's merge function (count merges as sum).  Exact for the
    decomposable aggregates ``rollup_windows`` allows; at 100 TB the
    refresh cost is O(delta + touched windows), not O(history)."""
    parsed = {}
    for out_col, spec in aggs.items():
        kind, _, _src = spec.partition(":")
        if kind not in _MERGE:
            raise ValueError(f"non-decomposable aggregate: {kind}")
        parsed[out_col] = kind
    merge = [_MERGE[kind](out_col).alias(out_col)
             for out_col, kind in parsed.items()]
    both = existing.unionByName(delta)
    return both.groupBy("window", *keys).agg(*merge)
