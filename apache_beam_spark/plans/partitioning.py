"""Physical-layout helpers shared by CPU-bound operators.

A single small parquet file scans as ONE task (a parquet file only
splits at row-group boundaries), so signature hashing, gemm batches,
or explode-amplified per-row work would all run on one core no matter
how many executors exist.  ``parallelize_narrow`` repartitions such
inputs up to the cluster's default parallelism — and is a no-op for
any at-scale input that already arrives in many splits, so it never
adds a shuffle where the data layout is already right.

The target is SIZE-ADAPTIVE (optimization r13, guide §2): a fixed
``repartition(defaultParallelism)`` turned every kilobyte-sized input
into a 32-task round-robin shuffle whose Python stages then forked 32
workers each — pure fixed overhead at the small end (the local bench
and the driver's low-core scaling runs), and an over-split at the
large end would never trigger anyway.  The optimizer's size estimate
for the input plan picks the task count instead: one task per
``_QUANTUM`` bytes, clamped to [1, defaultParallelism].  At-scale
inputs (>= parallelism * quantum bytes) get exactly the old behavior;
a 600 KB embedding table stays a single partition and its gemm stage
runs as one Arrow batch instead of 32.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: bytes of input per task before another task is worth its scheduling
#: and Python-worker cost; 1 MiB keeps blob-heavy codec columns (100s
#: of KB per row) on full parallelism while collapsing narrow id/text
#: projections of the small fixtures to a handful of tasks.
_QUANTUM = 1 << 20


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Optimizer size estimate of the plan's output, no job."""
    try:
        return int(df._jdf.queryExecution().optimizedPlan().stats()
                   .sizeInBytes())
    except Exception:
        return None


def parallelize_narrow(df: DataFrame) -> DataFrame:
    """Repartition CPU-bound inputs that arrived in too few partitions;
    no-op when the scan already has parallelism (or is small enough
    that extra tasks are pure overhead)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    size = _plan_size_bytes(df)
    if size is not None and size >= 0:
        target = max(1, min(target, size // _QUANTUM))
    if target <= 1:
        # any layout already has >= 1 partition; skip the .rdd
        # conversion (driver-side physical planning) entirely
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
