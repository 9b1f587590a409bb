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

    The matched right row is carried as ONE struct through the running
    ``last(ignorenulls)`` fill, so a right row with NULLs in some fields
    cannot mix fields from different (older) right rows — the match is
    row-atomic, exactly ``merge_asof``.
    """
    right_cols = right_cols or [c for c in right.columns if c not in (on, right_ts)]
    collide = [c for c in right_cols if c in left.columns]
    if collide:
        raise ValueError(
            f"asof_join: right_cols {collide} collide with left columns; "
            "rename them on the right side first (e.g. .withColumnRenamed)")

    # pack the whole candidate right row into one struct => atomic match
    rhs = right.select(
        F.col(on),
        F.struct(F.col(right_ts).alias("__asof_ts__"),
                 *[F.col(c) for c in right_cols]).alias("__rrow__"),
    ).withColumn("__side__", F.lit(0)) \
     .withColumn("__ts__", F.col("__rrow__.__asof_ts__"))
    rtype = rhs.schema["__rrow__"].dataType

    lhs = left.withColumn("__side__", F.lit(1)) \
        .withColumn("__ts__", F.col(left_ts)) \
        .withColumn("__rrow__", F.lit(None).cast(rtype))
    for c in [c for c in lhs.columns if c not in rhs.columns]:
        rhs = rhs.withColumn(c, F.lit(None).cast(lhs.schema[c].dataType))
    tagged = lhs.unionByName(rhs.select(*lhs.columns))

    # right rows sort BEFORE left rows at equal ts (<= semantics)
    w = (W.partitionBy(on).orderBy(F.col("__ts__"), F.col("__side__"))
         .rowsBetween(W.unboundedPreceding, 0))
    out = tagged.withColumn("__rrow__", F.last("__rrow__", ignorenulls=True).over(w)) \
        .filter(F.col("__side__") == 1)
    if tolerance is not None:
        stale = (F.col("__rrow__.__asof_ts__")
                 < F.col("__ts__") - F.expr(f"INTERVAL {tolerance}"))
        out = out.withColumn(
            "__rrow__",
            F.when(stale, F.lit(None).cast(rtype)).otherwise(F.col("__rrow__")))
    return out.select(
        *left.columns,
        F.col("__rrow__.__asof_ts__").alias("__asof_ts__"),
        *[F.col(f"__rrow__.{c}").alias(c) for c in right_cols])
