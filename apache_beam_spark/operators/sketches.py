"""Count-min sketch: fixed-memory approximate frequencies.

The mergeable counting sketch for unbounded-cardinality streams: a
``depth x width`` counter grid where every item increments one bucket
per row (independent hashes).  Point estimate = min over rows — always
an OVER-estimate, with error <= 2N/width at confidence 1-(1/2)^depth.
The reference's combiner model (CombineFn with mergeable accumulators)
is exactly this shape; here the sketch IS a relational aggregate.

Design for 100 TB:
- BUILD is one ``groupBy(r, b).sum()`` — map-side partial combine
  collapses every partition to <= depth*width rows before the
  shuffle, so the shuffle is sketch-sized, never data-sized, and the
  output is bounded (depth*width rows) regardless of item
  cardinality.  That boundedness is the point: exact wordcount over
  a 100 TB crawl shuffles the vocabulary; the sketch shuffles KBs.
- MERGE across shards / days / streaming windows is elementwise add
  (``union -> groupBy(r, b).sum()``) — associative + commutative,
  the CombineFn contract.
- HASHES are md5-derived (first 8 hex digits, salted by the row
  index), the repo's portable-hash idiom — deterministic across
  engines, so the whole sketch and every estimate is value-oracled
  in DuckDB, collisions included.
- ESTIMATE broadcasts the (tiny, bounded) sketch against the query
  items: one broadcast join + min aggregate, all codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _bucket(item: Column, r: Column, width: int) -> Column:
    """Portable bucket hash: first 8 md5 hex digits of 'item|r'."""
    h = F.md5(F.concat(item.cast("string"), F.lit("|"), r.cast("string")))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long")
            % F.lit(width)).cast("int")


def count_min_sketch(df: DataFrame, item_col: str, depth: int = 4,
                     width: int = 256,
                     weight_col: str | None = None) -> DataFrame:
    """(r, b, cnt): the depth x width counter grid.  Rows with zero
    count are absent (treat missing as 0 when estimating)."""
    w = F.col(weight_col) if weight_col else F.lit(1).cast("long")
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    return (df.select(F.col(item_col).alias("__item__"), w.alias("__w__"))
            .select("__item__", "__w__", r)
            .select("r", _bucket(F.col("__item__"), F.col("r"), width)
                    .alias("b"), "__w__")
            .groupBy("r", "b").agg(F.sum("__w__").alias("cnt")))


def cms_merge(*sketches: DataFrame) -> DataFrame:
    """Elementwise add — the mergeable-accumulator contract."""
    out = sketches[0]
    for s in sketches[1:]:
        out = out.unionByName(s)
    return out.groupBy("r", "b").agg(F.sum("cnt").alias("cnt"))


def cms_estimate(sketch: DataFrame, items: DataFrame, item_col: str,
                 depth: int, width: int,
                 est_col: str = "est") -> DataFrame:
    """Point estimates for every row of ``items``: min over the depth
    probe buckets (missing bucket = 0).  The sketch is bounded
    (depth*width rows), so it broadcasts."""
    r = F.explode(F.array(*[F.lit(i) for i in range(depth)])).alias("r")
    probes = (items.select(F.col(item_col), r)
              .select(item_col, "r",
                      _bucket(F.col(item_col), F.col("r"), width)
                      .alias("b")))
    return (probes.join(F.broadcast(sketch), on=["r", "b"], how="left")
            .groupBy(item_col)
            .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0).cast("long")))
                 .alias(est_col)))


def cms_counts(df: DataFrame, item_col: str, depth: int = 4,
               width: int = 256,
               weight_col: str | None = None) -> DataFrame:
    """Sketch + estimate for every distinct item in one call:
    (item_col, est).  est >= true count always; equality iff the
    item's min-count bucket row has no colliding mass."""
    sketch = count_min_sketch(df, item_col, depth, width, weight_col)
    return cms_estimate(sketch, df.select(item_col).distinct(), item_col,
                        depth, width)
