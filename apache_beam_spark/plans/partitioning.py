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
large end would never trigger anyway.  One task per ``_QUANTUM``
bytes of input, clamped to [1, defaultParallelism]: at-scale inputs
(>= parallelism * quantum bytes) get exactly the old behavior; a
600 KB embedding table stays on 1-2 partitions and its gemm stage
runs as a couple of Arrow batches instead of 32.

The size signal is the sum of the ANALYZED plan's leaf-relation sizes
(parquet file bytes), not the optimizer's output-size estimate: the
optimizer's estimate for a not-yet-materialized cached join flips by
five orders of magnitude between the first and second construction of
the same plan (join-product guess -> accurate cache size), which made
the embedded Repartition node NON-DETERMINISTIC — two builds of one
query produced different logical plans, breaking every plan-keyed
probe memo downstream.  Leaf file sizes are constant for the life of
the data, so the same plan always gets the same layout; as a bound
they only ever OVER-estimate (a filter or aggregate makes the real
input smaller), which errs toward parallelism — the safe direction at
scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

#: bytes of input per task before another task is worth its scheduling
#: and Python-worker cost; 1 MiB keeps blob-heavy codec columns (100s
#: of KB per row) on full parallelism while collapsing narrow id/text
#: projections of the small fixtures to a handful of tasks.
_QUANTUM = 1 << 20


def _plan_size_bytes(df: DataFrame) -> int | None:
    """Upper bound on the plan's input bytes: sum of leaf-relation
    sizes from the ANALYZED plan (no optimizer run, no job).  A leaf
    with unknown stats (e.g. a checkpointed RDD scan) reports
    ``spark.sql.defaultSizeInBytes`` = 2^63-ish, saturating the sum —
    which falls back to full parallelism, the pre-r13 behavior."""
    try:
        leaves = df._jdf.queryExecution().analyzed().collectLeaves()
        total = 0
        for i in range(leaves.size()):
            total += int(str(leaves.apply(i).stats().sizeInBytes()))
        return total
    except Exception:
        return None


def parallelize_narrow(df: DataFrame, weight: float = 1.0) -> DataFrame:
    """Repartition CPU-bound inputs that arrived in too few partitions;
    no-op when the scan already has parallelism (or is small enough
    that extra tasks are pure overhead).

    ``weight`` is the caller's CPU-amplification factor — how many
    times more work the downstream stage does per input byte than a
    plain columnar pass (a stride-1 20-token window hash does ~20x the
    string work of its input; a gemm does ~1x).  It scales the
    effective size so a small-but-amplified input still fans out,
    while staying a no-op at scale (any at-scale input saturates the
    parallelism clamp with or without the weight)."""
    target = df.sparkSession.sparkContext.defaultParallelism
    size = _plan_size_bytes(df)
    if size is not None and size >= 0:
        target = max(1, min(target, int(size * weight) // _QUANTUM))
    if target <= 1:
        # any layout already has >= 1 partition; skip the .rdd
        # conversion (driver-side physical planning) entirely
        return df
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
