"""N-gram Jaccard similarity via prefix-filtered inverted index.

Exact Jaccard >= t pairs, PPJoin-style: if J(A,B) >= t, then A and B
must share at least one shingle among the first ``|d| - ceil(t*|d|) + 1``
shingles of each, when both documents order their shingles by one global
canonical order (rarest first).  Candidate generation therefore joins
only PREFIX postings — a tiny fraction of the full inverted index — and
an exact array-intersection verify computes the true Jaccard for the
surviving candidates only.

Versus the naive all-postings self-join, the per-shingle join cost drops
from df^2 on every shingle to prefix-only postings, and rarest-first
ordering makes those postings the shortest ones.  At 100 TB the
shuffles carry (shingle, id) prefix pairs and the verify joins full
shingle arrays only for candidate pairs.

Scale controls: ``max_df`` removes ultra-frequent boilerplate shingles
from the universe entirely (consistently — they count in neither the
intersection nor the union).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

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
    inv = toks.select("id", F.explode("sh").alias("g"))
    gdf = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df")) \
        .filter(F.col("df") <= F.lit(max_df))

    # rarest-first canonical order within each doc; prefix length
    # n - ceil(t*n) + 1 guarantees no J>=t pair is missed
    ranked = (
        inv.join(gdf, on="g")  # also drops max_df-pruned shingles
        .withColumn("rn", F.row_number().over(
            W.partitionBy("id").orderBy(F.col("df"), F.col("g"))))
        .withColumn("n", F.max("rn").over(W.partitionBy("id")))
        .cache()  # consumed by both candidate generation and verify
    )
    prefix = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1
    ).select("id", "g")

    cand = (
        prefix.alias("x").join(prefix.alias("y"), on="g")
        .filter(F.col("x.id") < F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )

    # exact verify on the (max_df-pruned) shingle sets of candidates only
    pruned = ranked.groupBy("id").agg(F.collect_list("g").alias("sh"),
                                      F.first("n").alias("n"))
    out = (
        cand
        .join(pruned.select(F.col("id").alias("id_a"), F.col("sh").alias("sha"),
                            F.col("n").alias("na")), on="id_a")
        .join(pruned.select(F.col("id").alias("id_b"), F.col("sh").alias("shb"),
                            F.col("n").alias("nb")), on="id_b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn("jaccard", F.col("inter") / (F.col("na") + F.col("nb") - F.col("inter")))
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))
    )
    return out


def ngram_containment_pairs(df: DataFrame, text_col: str = "text",
                            id_col: str = "doc_id", shingle_k: int = 3,
                            threshold: float = 0.8,
                            max_df: int = 10000) -> DataFrame:
    """Asymmetric containment C(a in b) = |a∩b| / |a| >= threshold:
    detects documents SUBSUMED by larger ones (quote inclusion,
    boilerplate wrapping), which symmetric Jaccard misses whenever the
    big document dwarfs the small one.

    Prefix filtering applies to the CONTAINED side only (if
    |a∩b| >= t|a|, one of a's first ``|a| - ceil(t|a|) + 1`` canonical
    shingles is in b), so candidates join a's prefix postings against
    b's full postings — ``max_df`` caps the hot-posting blowup the
    full side would otherwise drive.  Output: (id_a, id_b,
    containment) with a contained in b; both directions emitted when
    both hold.
    """
    from apache_beam_spark.dedup.minhash import _parallelize_narrow

    toks = _parallelize_narrow(df.select(F.col(id_col), F.col(text_col))).select(
        F.col(id_col).alias("id"),
        F.array_distinct(shingles(F.col(text_col), shingle_k)).alias("sh"),
    )
    inv = toks.select("id", F.explode("sh").alias("g"))
    gdf = inv.groupBy("g").agg(F.count(F.lit(1)).alias("df")) \
        .filter(F.col("df") <= F.lit(max_df))
    ranked = (
        inv.join(gdf, on="g")
        .withColumn("rn", F.row_number().over(
            W.partitionBy("id").orderBy(F.col("df"), F.col("g"))))
        .withColumn("n", F.max("rn").over(W.partitionBy("id")))
        .cache()
    )
    prefix_a = ranked.filter(
        F.col("rn") <= F.col("n") - F.ceil(F.col("n") * F.lit(threshold)) + 1
    ).select("id", "g")

    cand = (
        prefix_a.alias("x").join(ranked.select("id", "g").alias("y"), on="g")
        .filter(F.col("x.id") != F.col("y.id"))
        .select(F.col("x.id").alias("id_a"), F.col("y.id").alias("id_b"))
        .distinct()
    )
    pruned = ranked.groupBy("id").agg(F.collect_list("g").alias("sh"),
                                      F.first("n").alias("n"))
    return (
        cand
        .join(pruned.select(F.col("id").alias("id_a"), F.col("sh").alias("sha"),
                            F.col("n").alias("na")), on="id_a")
        .join(pruned.select(F.col("id").alias("id_b"), F.col("sh").alias("shb")),
              on="id_b")
        .withColumn("inter", F.size(F.array_intersect("sha", "shb")))
        .withColumn("containment", F.col("inter") / F.col("na"))
        .filter(F.col("containment") >= threshold)
        .select("id_a", "id_b", F.round("containment", 6).alias("containment"))
    )
