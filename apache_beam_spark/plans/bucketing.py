"""Bucketed (co-located) joins: the shuffle-free path for repeated big
joins.

The reference had nothing like this — every CoGBK shuffled both sides
every time.  Spark bucketing pre-shuffles ONCE at write: both tables
hash-partitioned into the same bucket count on the join key join
bucket-to-bucket with NO Exchange at read.  At 100 TB, a fact table
joined nightly against another fact on the same key amortizes its only
shuffle into the write.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(df: DataFrame, table: str, bucket_cols: list[str],
                   num_buckets: int = 32, sort_cols: Optional[list[str]] = None,
                   mode: str = "overwrite") -> None:
    """Persist hash-bucketed (and optionally sorted — enables merge-join
    without the sort step) as a managed table."""
    w = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.format("parquet").saveAsTable(table)


def bucketed_join(spark: SparkSession, left_table: str, right_table: str,
                  on: list[str], how: str = "inner") -> DataFrame:
    """Join two same-bucketed tables — Catalyst sees the matching
    output partitionings and plans a join with zero Exchange operators
    (verify with ``plans.shuffle_count``)."""
    return spark.table(left_table).join(spark.table(right_table), on=on, how=how)
