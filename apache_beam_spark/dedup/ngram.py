"""N-gram Jaccard similarity via inverted index.

The classic scalable exact-jaccard path: explode distinct shingles ->
inverted index (shingle -> docs) -> self-join per shingle to count
intersections -> jaccard = inter / (|A| + |B| - inter).

Scale controls: drop ultra-frequent shingles (``max_df``) — they only
connect boilerplate and quadratically inflate the per-shingle join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.functions.text import shingles


def ngram_jaccard_pairs(df: DataFrame, text_col: str = "text", id_col: str = "doc_id",
                        shingle_k: int = 3, threshold: float = 0.3,
                        max_df: int = 10000) -> DataFrame:
    """Exact n-gram Jaccard >= threshold pairs: (id_a, id_b, jaccard)."""
    from apache_beam_spark.dedup.minhash import _parallelize_narrow

    toks = _parallelize_narrow(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    sizes = toks.select("id", F.size("sh").alias("n")).cache()
    # cache: the self-join below evaluates the posting list twice
    inv = toks.select("id", F.explode("sh").alias("g")).cache()
    # prune boilerplate shingles
    rare = inv.groupBy("g").agg(F.count("*").alias("df")).filter(F.col("df") <= F.lit(max_df))
    inv = inv.join(rare.select("g"), on="g", how="left_semi")
    inter = (
        inv.alias("x").join(inv.alias("y"), on="g")
        .filter(F.col("x.id") < F.col("y.id"))
        .groupBy(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .agg(F.count("*").alias("inter"))
    )
    out = (
        inter
        .join(sizes.select(F.col("id").alias("id_a"), F.col("n").alias("na")), on="id_a")
        .join(sizes.select(F.col("id").alias("id_b"), F.col("n").alias("nb")), on="id_b")
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out
