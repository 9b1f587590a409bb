"""As-of (point-in-time) join — a time-series operator the reference
lacks entirely (SURVEY.md §2.4: key-equality joins only) and Spark has
no native operator for; added as a first-class training-pipeline op
(feature lookups "as of" an event's timestamp are the canonical
point-in-time-correctness primitive for training data).

Implementation is the scalable merge-based formulation, NOT a range
join: union both sides tagged, one shuffle on the key, and a running
``last(ignorenulls)`` over (ts, side) order fills each left row with
the most recent right row at or before its timestamp.  Cost is one
shuffle + one sort — no candidate-pair explosion, no range predicate,
skew handled by AQE like any keyed shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W


def asof_join(left: DataFrame, right: DataFrame, on: str,
              left_ts: str = "ts", right_ts: str = "ts",
              right_cols: Optional[list[str]] = None,
              tolerance: Optional[str] = None) -> DataFrame:
    """For every left row: the latest right row of the same key with
    ``right_ts <= left_ts`` (DuckDB/pandas ``merge_asof`` semantics,
    backward direction).  Unmatched left rows keep nulls.

    ``tolerance``: optional max staleness interval (e.g. ``"1 hour"``) —
    matches older than that are nulled out, exactly pandas' tolerance.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]

    lhs = left.withColumn("__side__", F.lit(1)).withColumn("__ts__", F.col(left_ts))
    rhs = right.select(
        F.col(on), F.col(right_ts).alias("__rts_src__"),
        *[F.col(c) for c in right_cols]
    ).withColumn("__side__", F.lit(0)).withColumn("__ts__", F.col("__rts_src__"))

    # outer-union schemas: null-pad each side's missing columns
    left_only = [c for c in lhs.columns if c not in rhs.columns]
    right_only = [c for c in rhs.columns if c not in lhs.columns]
    for c in right_only:
        lhs = lhs.withColumn(c, F.lit(None).cast(rhs.schema[c].dataType))
    for c in left_only:
        rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    tagged = lhs.unionByName(rhs.select(*lhs.columns))

    # right rows sort BEFORE left rows at equal ts (<= semantics)
    w = (W.partitionBy(on).orderBy(F.col("__ts__"), F.col("__side__"))
         .rowsBetween(W.unboundedPreceding, 0))
    filled = tagged
    for c in [*right_cols, "__rts_src__"]:
        filled = filled.withColumn(c, F.last(c, ignorenulls=True).over(w))

    out = filled.filter(F.col("__side__") == 1)
    if tolerance is not None:
        stale = F.col("__rts_src__") < F.col("__ts__") - F.expr(f"INTERVAL {tolerance}")
        for c in [*right_cols, "__rts_src__"]:
            out = out.withColumn(
                c, F.when(stale, F.lit(None).cast(out.schema[c].dataType))
                .otherwise(F.col(c)))
    return out.withColumnRenamed("__rts_src__", "__asof_ts__") \
        .drop("__side__", "__ts__")
