"""Sequence packing: greedy bin packing of documents into fixed token
budgets — the "pack short docs into one context window" stage of an LLM
training-data pipeline.

Packing is inherently sequential, so it cannot be one big window
function; but it only needs to be sequential WITHIN a shard.  The
operator shards rows deterministically (id modulo n_shards), sorts each
shard by id, and walks it once inside ``applyInPandas`` — first-fit:
a row that would overflow the budget closes the bin and opens the next.

Scale notes (100 TB):
- One shuffle (the groupBy-shard), then O(rows) local work per shard;
  n_shards controls parallelism and per-task memory independently of
  the data size.  No driver-side state, no global sort.
- Deterministic: shard = id % n_shards and ascending-id order give a
  reproducible packing on any cluster size — important when the
  packing defines training-example boundaries that must be re-derivable.
- A row larger than the budget still gets its own bin (acc resets),
  matching the greedy first-fit recurrence exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_greedy(df: DataFrame, capacity: int, size_col: str = "n_chars",
                id_col: str = "doc_id", n_shards: int = 8) -> DataFrame:
    """Assign (shard, bin) to every row: DataFrame(id_col, shard, bin,
    plus size_col) with greedy sequential packing per shard."""

    def pack(pdf):
        import pandas as pd

        pdf = pdf.sort_values("__id__").reset_index(drop=True)
        bins = []
        acc, bin_idx = 0, 0
        for i, s in enumerate(pdf["__size__"]):
            s = int(s)
            if i > 0 and acc + s > capacity:
                bin_idx += 1
                acc = 0
            acc += s
            bins.append(bin_idx)
        return pd.DataFrame({
            "__id__": pdf["__id__"], "__shard__": pdf["__shard__"],
            "__bin__": bins, "__size__": pdf["__size__"],
        })

    shard = (F.col(id_col) % F.lit(n_shards)).cast("int")
    prepped = df.select(
        F.col(id_col).alias("__id__"),
        shard.alias("__shard__"),
        F.col(size_col).cast("long").alias("__size__"),
    )
    out = prepped.groupBy("__shard__").applyInPandas(
        pack, schema="__id__ long, __shard__ int, __bin__ int, __size__ long")
    return out.select(
        F.col("__id__").alias(id_col), F.col("__shard__").alias("shard"),
        F.col("__bin__").alias("bin"), F.col("__size__").alias(size_col))
