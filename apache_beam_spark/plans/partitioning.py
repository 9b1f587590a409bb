"""Physical-layout helpers shared by CPU-bound operators.

A single small parquet file scans as ONE task (a parquet file only
splits at row-group boundaries), so signature hashing, gemm batches,
or explode-amplified per-row work would all run on one core no matter
how many executors exist.  ``parallelize_narrow`` repartitions such
inputs up to the cluster's default parallelism — and is a no-op for
any at-scale input that already arrives in many splits, so it never
adds a shuffle where the data layout is already right.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def parallelize_narrow(df: DataFrame) -> DataFrame:
    """Repartition CPU-bound inputs that arrived in too few partitions;
    no-op when the scan already has parallelism."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
