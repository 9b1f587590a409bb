"""Exact deduplication.

Hash-groupBy dedup: one shuffle on the fingerprint, map-side partial
dedup via min_by partial aggregation.  At 100 TB the shuffle carries
only (fingerprint, id) pairs when ``project=True`` — dedup decisions
join back to the full rows by id, so wide document payloads never
shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.functions.text import fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                normalize: bool = True) -> DataFrame:
    """Keep the smallest-id witness per exact (normalized) text.

    Returns the surviving rows with original columns.
    """
    from apache_beam_spark.dedup.minhash import _parallelize_narrow

    fp = fingerprint(F.col(text_col)) if normalize else F.md5(F.col(text_col))
    keep = (
        _parallelize_narrow(df.select(F.col(id_col), F.col(text_col)))
        .select(F.col(id_col), fp.alias("__fp__"))
        .groupBy("__fp__").agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    # broadcast-able when survivors are small; else shuffled semi-join.
    return df.join(keep, on=id_col, how="left_semi")


def fingerprint_dedup(df: DataFrame, fp_col: Column, id_col: str = "doc_id") -> DataFrame:
    """Generic: dedup by any precomputed fingerprint column."""
    keep = (
        df.select(F.col(id_col), fp_col.alias("__fp__"))
        .groupBy("__fp__").agg(F.min(id_col).alias(id_col))
        .select(id_col)
    )
    return df.join(keep, on=id_col, how="left_semi")
