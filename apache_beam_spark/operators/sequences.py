"""Event-sequence (funnel instance) matching — MATCH_RECOGNIZE-lite.

Extracts concrete instances of an ordered event pattern per key: for
every occurrence of step 0, the EARLIEST step-1 event strictly after
it (within a bound), then the earliest step-2 event strictly after
that, and so on — the "next matching event" chain analysts write with
MATCH_RECOGNIZE or sessionized UDFs.  (Funnel COUNTS are a different,
cheaper query; this returns the matched timestamps themselves.)

Spark shape: "earliest event of type T after t" is computed for EVERY
row in one pass with a reverse-ordered running minimum —

    min(ts if type == T) OVER (PARTITION BY key ORDER BY ts DESC
                               ROWS UNBOUNDED PRECEDING .. 1 PRECEDING)

— one window (= one keyed shuffle, reused by all steps since they
share partitioning and ordering), no per-row subqueries, no Python.
Each chained step then resolves through ONE keyed equi-join back to
the event row it matched, to pick up THAT row's next-step pointer.
Per key the work is O(events · steps); keys parallelize freely, so a
1000-executor cluster sees only `steps` keyed shuffles total.

Ties: two events of one key sharing an identical timestamp would make
"strictly after" ambiguous; the window breaks them deterministically
by event id, and microsecond event time makes real collisions
vanishing.
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
    step is the earliest event of its type strictly after the previous
    step's timestamp and no more than ``within_each`` later.  A step-0
    event anchors at most one instance (the greedy-earliest one).
    """
    if len(steps) < 2:
        raise ValueError("funnel_instances needs at least 2 steps")

    w = (W.partitionBy(key_col)
         .orderBy(F.col(ts_col).desc(), F.col(id_col).desc())
         .rowsBetween(W.unboundedPreceding, -1))
    nxt = events.select(
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
            # fetch the matched row's own next-step pointer
            link = nxt.filter(F.col(type_col) == steps[i]).select(
                key_col, F.col(ts_col).alias(step_ts),
                F.col(f"__next_{i+1}__"))
            out = out.join(link, on=[key_col, step_ts])
        prev_ts = step_ts
    return out
