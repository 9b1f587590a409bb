"""Event-sequence (funnel instance) matching — MATCH_RECOGNIZE-lite.

Extracts concrete instances of an ordered event pattern per key: for
every occurrence of step 0, the EARLIEST step-1 event strictly after
it (within a bound), then the earliest step-2 event strictly after
that, and so on — the "next matching event" chain analysts write with
MATCH_RECOGNIZE or sessionized UDFs.  (Funnel COUNTS are a different,
cheaper query; this returns the matched timestamps themselves.)

Spark shape: "earliest event of type T strictly after t" is computed
for EVERY row in one pass with a reverse-ordered running minimum over
a RANGE frame on the event-time epoch —

    min(ts if type == T) OVER (PARTITION BY key ORDER BY epoch_us DESC
                               RANGE UNBOUNDED PRECEDING .. 1 PRECEDING)

— one window (= one keyed shuffle, reused by all steps since they
share partitioning and ordering), no per-row subqueries, no Python.
The RANGE frame makes "strictly after" exact: events sharing the
current row's timestamp are OUTSIDE the frame, so the pointer is a
pure function of (key, ts).  That purity is what lets each chained
step resolve through ONE deduplicated keyed equi-join back to the
matched timestamp without fan-out when several events of the chained
type share a timestamp.  Per key the work is O(events · steps); keys
parallelize freely, so a 1000-executor cluster sees only `steps`
keyed shuffles total.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def funnel_instances(events: DataFrame, steps: Sequence[str],
                     within_each: str,
                     key_col: str = "user_id", ts_col: str = "ts",
                     type_col: str = "event_type",
                     id_col: str = "event_id") -> DataFrame:
    """Instances of ``steps[0] -> steps[1] -> ...`` per key.

    Returns one row per completed chain:
    ``(key_col, <step0>_ts, <step1>_ts, ...)`` where each following
    step is the earliest event of its type STRICTLY after the previous
    step's timestamp and no more than ``within_each`` later.  A step-0
    event anchors at most one instance (the greedy-earliest one);
    equal-timestamp events of the chained type share one pointer, so
    no join fan-out occurs.
    """
    if len(steps) < 2:
        raise ValueError("funnel_instances needs at least 2 steps")

    # RANGE frame on epoch micros: strictly-later events only (an
    # equal-ts event is NOT "after"), matching min(ts) WHERE ts > t.
    # cast handles TIMESTAMP_NTZ parquet columns; any tz shift is a
    # constant offset, so the strict ordering the frame needs survives
    ev = events.withColumn(
        "__us__", F.unix_micros(F.col(ts_col).cast("timestamp")))
    w = (W.partitionBy(key_col)
         .orderBy(F.col("__us__").desc())
         .rangeBetween(W.unboundedPreceding, -1))
    nxt = ev.select(
        key_col, ts_col, type_col,
        *[F.min(F.when(F.col(type_col) == s, F.col(ts_col))).over(w)
          .alias(f"__next_{i}__")
          for i, s in enumerate(steps) if i > 0])

    within = F.expr(f"INTERVAL {within_each}")
    out = (nxt.filter(F.col(type_col) == steps[0])
           .select(key_col, F.col(ts_col).alias(f"{steps[0]}_ts"),
                   F.col("__next_1__")))
    prev_ts = f"{steps[0]}_ts"
    for i in range(1, len(steps)):
        step_ts = f"{steps[i]}_ts"
        out = (out.filter(F.col(f"__next_{i}__").isNotNull()
                          & (F.col(f"__next_{i}__") <= F.col(prev_ts) + within))
               .withColumnRenamed(f"__next_{i}__", step_ts))
        if i + 1 < len(steps):
            # fetch the matched row's own next-step pointer; the
            # pointer depends only on (key, ts), so dedup makes the
            # join exactly 1:1 even with equal-ts duplicate events
            link = (nxt.filter(F.col(type_col) == steps[i])
                    .select(key_col, F.col(ts_col).alias(step_ts),
                            F.col(f"__next_{i+1}__"))
                    .dropDuplicates([key_col, step_ts]))
            out = out.join(link, on=[key_col, step_ts])
        prev_ts = step_ts
    return out
