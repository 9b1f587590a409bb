"""Streaming windowed heavy hitters (Misra-Gries in keyed state).

The unbounded twin of ``operators/heavy_hitters.py``: per fixed event-
time window, a Misra-Gries summary of at most ``capacity`` counters
lives in the window's state; the window emits its surviving counters
once the query watermark passes the window end, then frees the state.

Why not ``groupBy(window, item).count()``?  That keeps one state row
per DISTINCT ITEM per open window — for token streams that's the
vocabulary times the window count, and the state store becomes the
bottleneck.  Misra-Gries caps state at ``capacity`` counters per
window with the classic guarantee: any item with true count >
n/(capacity+1) survives, and every reported count undercounts by at most
n/(capacity+1).  With ``capacity`` >= the window's distinct-item count
the summary degenerates to exact counting (useful for tests/oracles).

Mechanics mirror ``streaming/sequences.py``: JSON state blob, global
watermark via ``getCurrentWatermarkMs``, event-time timeout re-arming
at watermark+1 so idle windows still close.
"""

from __future__ import annotations

import json

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType, TimestampNTZType

from apache_beam_spark.streaming.stateful import stateful_per_key


def streaming_heavy_hitters(df: DataFrame, item_col: str,
                            window_ms: int, capacity: int = 50,
                            min_count: int = 1,
                            ts_col: str = "ts",
                            lateness_ms: int = 0) -> DataFrame:
    """Per closed window: items whose MG count reaches ``min_count``.

    Output ``(window_start, item, approx_count)`` — ``window_start`` as
    epoch MICROSECOND long; ``approx_count`` undercounts by at most
    (window rows)/(capacity+1).  Rows later than ``lateness_ms`` are
    dropped (standard watermark discipline).
    """
    window_us = window_ms * 1000

    dtype = df.schema[ts_col].dataType
    ts_long = (F.unix_micros(F.col(ts_col).cast("timestamp"))
               if isinstance(dtype, (TimestampType, TimestampNTZType))
               else F.col(ts_col).cast("long"))
    src = (df.select((F.floor(ts_long / window_us) * window_us)
                     .cast("long").alias("w"),
                     F.col(item_col).cast("string").alias("item"),
                     ts_long.alias("t"),
                     F.timestamp_micros(ts_long).alias("__wmts__"))
           .withWatermark("__wmts__", f"{max(lateness_ms, 0)} milliseconds"))

    out_schema = "window_start bigint, item string, approx_count bigint"
    state_schema = "js string"

    def fn(key, pdfs, state):
        w_start = key[0]
        counters = json.loads(state.get[0]) if state.exists else {}
        wm_us = state.getCurrentWatermarkMs() * 1000
        if not state.hasTimedOut:
            for pdf in pdfs:
                # standard late-row discipline: rows behind the
                # watermark are beyond the lateness bound -> dropped
                pdf = pdf[pdf["t"] >= wm_us]
                for item, c in pdf["item"].value_counts().items():
                    counters[item] = counters.get(item, 0) + int(c)
                if len(counters) > capacity:
                    # mergeable-summaries trim: subtract the
                    # (capacity+1)-th largest count from everyone
                    cut = sorted(counters.values())[-(capacity + 1)]
                    counters = {i: n - cut for i, n in counters.items()
                                if n > cut}
        if wm_us >= w_start + window_us:  # window closed: emit + free
            if state.exists:
                state.remove()
            items = [(i, n) for i, n in counters.items() if n >= min_count]
            if items:
                yield pd.DataFrame({
                    "window_start": [w_start] * len(items),
                    "item": [i for i, _ in items],
                    "approx_count": [n for _, n in items]})
        else:
            state.update((json.dumps(counters),))
            state.setTimeoutTimestamp(state.getCurrentWatermarkMs() + 1)

    return stateful_per_key(src, ["w"], fn, out_schema, state_schema,
                            timeout="EventTimeTimeout")
