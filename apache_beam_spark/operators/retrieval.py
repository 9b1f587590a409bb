"""Corpus retrieval scoring: BM25 over the tokenized documents table.

Beyond-reference operator (the reference stops at TF-IDF,
``examples/java8/.../TfIdf``-style): BM25 is the standard lexical
ranking function for corpus search / dedup triage / quality probes
over a training corpus.

100 TB shape:
* the query term set is tiny and BROADCAST — corpus tokens are
  filtered to query terms BEFORE any shuffle, so the exploded token
  stream never moves in full;
* document frequencies and corpus stats (N, avgdl) are partial-agged
  scalars/kilobyte frames, broadcast back;
* per-(doc, term) TF is one keyed shuffle on doc_id; the final top-k
  is a bounded window.

All math is Column expressions (ln/division in doubles, rounded for
engine portability); no UDFs.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from apache_beam_spark.functions.text import word_tokens


def bm25_topk(docs: DataFrame, query_terms: Sequence[str], k: int = 20,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Top-k documents by BM25 score for one query term set.

    Uses the Lucene-style non-negative idf
    ``ln(1 + (N - df + 0.5) / (df + 0.5))``; ``avgdl``/``N`` are
    corpus-wide stats.  Output: (doc_id, score, rank) — score rounded
    to 6dp, rank tiebroken by doc_id for determinism.
    """
    terms = sorted(set(query_terms))
    toks = docs.select(
        F.col(id_col),
        F.explode(word_tokens(F.col(text_col))).alias("term"))
    # doc lengths + corpus stats from ONE pre-filter pass (partial agg)
    dl = docs.select(
        F.col(id_col),
        F.size(word_tokens(F.col(text_col))).cast("double").alias("dl"))
    stats = dl.agg(F.count(F.lit(1)).alias("N"),
                   F.avg("dl").alias("avgdl"))

    hits = toks.filter(F.col("term").isin(terms))
    tf = hits.groupBy(id_col, "term").agg(
        F.count(F.lit(1)).cast("double").alias("tf"))
    dfreq = tf.groupBy("term").agg(
        F.count(F.lit(1)).cast("double").alias("df"))

    idf = (dfreq.crossJoin(F.broadcast(stats))
           .select("term", F.log(
               F.lit(1.0) + (F.col("N") - F.col("df") + F.lit(0.5))
               / (F.col("df") + F.lit(0.5))).alias("idf"),
               F.col("avgdl")))

    scored = (tf.join(F.broadcast(idf), on="term")
              .join(dl, on=id_col)
              .select(
                  id_col,
                  (F.col("idf") * F.col("tf") * F.lit(k1 + 1.0)
                   / (F.col("tf") + F.lit(k1)
                      * (F.lit(1.0 - b)
                         + F.lit(b) * F.col("dl") / F.col("avgdl"))))
                  .alias("part"))
              .groupBy(id_col).agg(F.sum("part").alias("raw")))
    # global top-k as TakeOrderedAndProject (per-partition heaps + one
    # driver merge of k rows), NOT a single-partition row_number window
    # — the ranked window then runs over k rows only
    top = scored.orderBy(F.col("raw").desc(), F.col(id_col)).limit(k)
    w = W.orderBy(F.col("raw").desc(), F.col(id_col))
    return (top.withColumn("rank", F.row_number().over(w))
            .select(id_col, F.round("raw", 6).alias("score"), "rank"))


def rrf_fuse(rankings: Sequence[DataFrame], k: int = 60, top: int = 20,
             id_col: str = "doc_id", rank_col: str = "rank") -> DataFrame:
    """Reciprocal-rank fusion (the standard hybrid-search combiner):
    score(d) = sum over rankers of 1 / (k + rank_i(d)); documents
    missing from a ranker contribute nothing.  Union + one keyed agg +
    TakeOrdered — ranker frames are top-k sized, so this is
    negligible next to the rankers themselves."""
    if not rankings:
        raise ValueError("at least one ranking required")
    parts = [r.select(F.col(id_col),
                      (F.lit(1.0) / (F.lit(float(k)) + F.col(rank_col)))
                      .alias("__rrf__")) for r in rankings]
    allr = parts[0]
    for p in parts[1:]:
        allr = allr.unionByName(p)
    fused = allr.groupBy(id_col).agg(F.sum("__rrf__").alias("raw"))
    out = fused.orderBy(F.col("raw").desc(), F.col(id_col)).limit(top)
    w = W.orderBy(F.col("raw").desc(), F.col(id_col))
    return (out.withColumn("fused_rank", F.row_number().over(w))
            .select(id_col, F.round("raw", 6).alias("rrf_score"),
                    "fused_rank"))
