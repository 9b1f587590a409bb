"""Warehouse/catalog table IO — HCatalogIO parity.

Reference: ``sdks/java/io/hcatalog/.../HCatalogIO.java`` (read :96,
write :134) reads/writes Hive-metastore tables record-by-record through
HCatalog.  Spark owns a catalog natively, so the mapping is
``spark.table`` / ``saveAsTable`` — plus bucketing metadata
(``plans/bucketing.py``) which HCatalog cannot express but which makes
repeated big joins shuffle-free.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession


def read_table(spark: SparkSession, table: str,
               filter_expr: Optional[str] = None) -> DataFrame:
    """HCatalogIO.read (HCatalogIO.java:96).  ``filter_expr`` maps the
    reference's withFilter partition predicate — Catalyst prunes
    partitions from it the same way HCatalog's filter string did."""
    df = spark.table(table)
    return df.filter(filter_expr) if filter_expr else df


def write_table(df: DataFrame, table: str, mode: str = "append",
                partition_by: Optional[list[str]] = None,
                bucket_by: Optional[list[str]] = None,
                num_buckets: int = 32,
                sort_by: Optional[list[str]] = None,
                format: str = "parquet") -> None:
    """HCatalogIO.write (HCatalogIO.java:134) -> saveAsTable.

    ``partition_by`` is the reference's withPartition (dynamic
    partition columns); ``bucket_by`` goes beyond the reference: the
    table is hash-bucketed so later equi-joins/aggs on those keys read
    pre-shuffled data (zero Exchange — see ``plans/bucketing.py``).
    """
    w = df.write.mode(mode).format(format)
    if partition_by:
        w = w.partitionBy(*partition_by)
    if bucket_by:
        w = w.bucketBy(num_buckets, *bucket_by)
        if sort_by:
            w = w.sortBy(*sort_by)
    w.saveAsTable(table)


def table_exists(spark: SparkSession, table: str) -> bool:
    return spark.catalog.tableExists(table)


def drop_table(spark: SparkSession, table: str) -> None:
    spark.sql(f"DROP TABLE IF EXISTS {table}")
