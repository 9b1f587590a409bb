"""Deterministic epoch shuffling for training dataloaders.

Training runs need each epoch's document order to be (a) uniformly
shuffled, (b) reproducible from a seed, and (c) addressable as
(shard, position) so a thousand dataloader workers can each stream one
shard sequentially.  RNG-based ``orderBy(rand())`` fails (b) across
retries and Spark versions; a keyed hash order fails nothing:

    key   = md5(seed || ':' || id)
    shard = int(first k hex digits)          -- 16^k shards
    pos   = rank of key within its shard

Changing the seed permutes everything; the same seed always yields the
same epoch.

Scale shape: assigning ``pos`` is a per-shard sort, so shard count is
the parallelism knob — 256 shards (k=2) keeps each reducer's sort at
1/256th of the corpus; at 100 TB use k=4 (65k shards, ~1.5 GB each).
Because the shard id is the leading digits of the sort key, shards
also partition the GLOBAL key order: (shard, pos) enumerates the same
permutation a single global sort would, without one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

_HEX = "0123456789abcdef"


def _hex_fold(h, k: int):
    """Integer value of the first k hex digits of string column h —
    built from instr() so the identical expression runs in DuckDB."""
    out = F.lit(0)
    for i in range(1, k + 1):
        out = out * 16 + (F.instr(F.lit(_HEX), F.substring(h, i, 1)) - 1)
    return out


def epoch_shuffle(df: DataFrame, id_col: str = "doc_id", seed: int = 0,
                  hex_digits: int = 2) -> DataFrame:
    """Assign every row a reproducible (shard, pos) for one epoch.

    Returns ``(id_col, shard, pos)``: ``shard`` in [0, 16^hex_digits),
    ``pos`` starting at 1 within each shard, ordered by the seeded md5
    key (ties impossible: the id breaks them deterministically).
    """
    h = F.md5(F.concat(F.lit(str(seed)), F.lit(":"),
                       F.col(id_col).cast("string")).cast("binary"))
    keyed = df.select(F.col(id_col), h.alias("__h__"),
                      _hex_fold(h, hex_digits).cast("int").alias("shard"))
    return keyed.select(
        id_col, "shard",
        F.row_number().over(
            W.partitionBy("shard").orderBy("__h__", id_col)).alias("pos"))


def weighted_sample(df: DataFrame, weight_col: str, n: int,
                    id_col: str = "doc_id",
                    seed: str = "ws1") -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis-Spirakis A-ES): each row draws a seeded-md5 uniform u
    and the top-n rows by ln(u)/w win — inclusion probability
    proportional to weight, one TakeOrdered pass, no RNG state, fully
    reproducible cross-engine (the oracle replays the same md5
    arithmetic).  Weights are floored at 1."""
    h = F.md5(F.concat(F.lit(seed + ":"),
                       F.col(id_col).cast("string")).cast("binary"))
    u = ((F.conv(F.substring(h, 1, 8), 16, 10).cast("double") + 1)
         / F.lit(float(1 << 32)))
    key = F.log(u) / F.greatest(F.col(weight_col).cast("double"), F.lit(1.0))
    return (df.withColumn("__wkey__", key)
            .orderBy(F.col("__wkey__").desc(), id_col)
            .limit(n)
            .select(id_col, F.col(weight_col).alias("weight"),
                    F.round("__wkey__", 6).alias("sample_key")))
