"""Streaming windowed count-min sketch.

The unbounded twin of ``operators/sketches.py``: per fixed event-time
window, the counter grid aggregates in Spark's windowed-aggregation
state and emits once the watermark closes the window.

Why a sketch here at all?  ``groupBy(window, item).count()`` keeps one
state row per DISTINCT ITEM per open window — vocabulary-sized for
token streams.  The CMS keeps at most ``depth * width`` state rows
per open window NO MATTER the cardinality, and the emitted grids are
mergeable across windows/streams with ``cms_merge`` (elementwise
add).  Unlike the Misra-Gries heavy-hitter state (heavy.py — a
custom Python stateful op), the CMS build IS a built-in windowed
aggregation: probes explode JVM-side, the grid lives in the state
store as plain sum aggregates, zero Python anywhere.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampNTZType, TimestampType

from apache_beam_spark.operators.sketches import _bucket


def streaming_cms(df: DataFrame, item_col: str, window_ms: int,
                  depth: int = 4, width: int = 256,
                  ts_col: str = "ts", lateness_ms: int = 0,
                  weight_col: str | None = None) -> DataFrame:
    """Per closed window: ``(window_start, r, b, cnt)`` — the same
    grid ``count_min_sketch`` builds in batch, ``window_start`` as
    epoch-microsecond long (the streaming-family convention).  Buckets
    with zero count are absent; estimate with ``cms_estimate``
    (missing = 0)."""
    dtype = df.schema[ts_col].dataType
    ts_long = (F.unix_micros(F.col(ts_col).cast("timestamp"))
               if isinstance(dtype, (TimestampType, TimestampNTZType))
               else F.col(ts_col).cast("long"))
    w = (F.col(weight_col).cast("long") if weight_col
         else F.lit(1).cast("long"))
    src = (df.select(F.col(item_col).cast("string").alias("__item__"),
                     w.alias("__w__"),
                     F.timestamp_micros(ts_long).alias("__wmts__"))
           .withWatermark("__wmts__", f"{max(lateness_ms, 0)} milliseconds"))
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    probes = (src.select("__item__", "__w__", "__wmts__", r)
              .select("__wmts__", "r", "__w__",
                      _bucket(F.col("__item__"), F.col("r"), width)
                      .alias("b")))
    agg = (probes.groupBy(
        F.window("__wmts__", f"{window_ms} milliseconds").alias("win"),
        "r", "b")
        .agg(F.sum("__w__").alias("cnt")))
    return agg.select(F.unix_micros("win.start").alias("window_start"),
                      "r", "b", "cnt")
