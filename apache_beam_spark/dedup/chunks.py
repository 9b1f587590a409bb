"""Chunk-level (paragraph) deduplication.

Splits every document into consecutive fixed-size word chunks and
removes chunks whose exact text already appeared earlier in the corpus
(keep-first witness: lowest ``(doc_id, chunk_idx)``), then reassembles
each document from its surviving chunks — the passage-level analogue of
exact dedup, the cheap first cut at removing boilerplate paragraphs
repeated across billions of pages.

Spark shape at 100 TB:

* chunking is a pure Column expression (tokenize → ``slice`` windows)
  — no Python, no shuffle, fused into the scan;
* the keep-first decision is ONE shuffle: a window
  ``row_number() OVER (PARTITION BY chunk ORDER BY doc_id, idx)``;
  chunks are the shuffle key, so repeated boilerplate lands on one
  reducer each — at most ``corpus_words / chunk_words`` rows wide, and
  a hot boilerplate chunk is exactly what we want on a single reducer
  (its postings list is the thing being deduplicated);
* reassembly is a second shuffle keyed by ``doc_id`` carrying only
  ``(doc_id, idx, chunk)`` survivors — the original text column never
  moves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from apache_beam_spark.functions.text import word_tokens


def chunk_dedup(df: DataFrame, text_col: str = "text",
                id_col: str = "doc_id", chunk_words: int = 10) -> DataFrame:
    """Per-document chunk dedup report.

    Returns ``(id_col, n_chunks, n_kept, text_dedup)`` where
    ``text_dedup`` is the document rebuilt (space-joined, normalized
    tokens) from chunks surviving corpus-wide keep-first dedup.
    Documents with no word tokens are dropped (no chunks to judge).
    """
    k = chunk_words
    w = word_tokens(F.col(text_col))
    n = F.size(w)
    # guard n == 0: sequence(0, -1) would infer step -1 and emit junk
    chunks = F.when(n > 0, F.transform(
        F.sequence(F.lit(0), F.ceil(n / F.lit(k)).cast("int") - 1),
        lambda i: F.array_join(F.slice(w, i * k + 1, k), " "))
    ).otherwise(F.array().cast("array<string>"))

    ch = (df.select(F.col(id_col), chunks.alias("__ch__"))
            .filter(F.size("__ch__") > 0)
            .select(id_col, F.posexplode("__ch__").alias("idx", "chunk")))

    ranked = ch.withColumn(
        "__rn__",
        F.row_number().over(
            W.partitionBy("chunk").orderBy(F.col(id_col), F.col("idx"))))

    return (
        ranked.groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_chunks"),
             F.sum((F.col("__rn__") == 1).cast("int")).alias("n_kept"),
             F.array_join(
                 F.transform(
                     F.array_sort(F.collect_list(
                         F.when(F.col("__rn__") == 1,
                                F.struct("idx", "chunk")))),
                     lambda s: s.chunk),
                 " ").alias("text_dedup"))
    )
