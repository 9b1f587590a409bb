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

    from apache_beam_spark.plans.partitioning import parallelize_narrow

    # tokenize+chunk+explode is the CPU stage and a small corpus scans
    # as one split — fan out first (no-op at scale); ~chunk_words x
    # the string work of a plain pass
    # no explicit size() > 0 filter: posexplode (outer=false) already
    # drops empty/null arrays, and the filter was WORSE than redundant
    # — Catalyst pushed it below the fan-out exchange, so the whole
    # tokenize+chunk expression ran twice more on the single-task scan
    # stage it was pushed into (optimization r13, the guide §4.4
    # duplicated-evaluation pathology in pure-Column form).  Catalyst
    # re-infers the same filter from the Generate unless
    # InferFiltersFromGenerate is excluded — engine.py excludes it
    # (see _ENGINE_CONF) for exactly this expression shape.
    ch = (parallelize_narrow(df.select(F.col(id_col), F.col(text_col)),
                             weight=chunk_words)
            .select(F.col(id_col), chunks.alias("__ch__"))
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


def sliding_chunks(df: DataFrame, chunk_words: int = 100,
                   overlap_words: int = 20, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_words: int = 1) -> DataFrame:
    """Overlapping retrieval chunks (the RAG-ingest shape): word
    windows of ``chunk_words`` advancing by ``chunk_words - overlap``,
    so consecutive chunks share ``overlap_words`` words of context.

    Pure Column HOFs (tokenize -> index sequence -> ``slice``), no
    Python, no shuffle — chunking fuses into the scan, and only
    (id, idx, chunk) rows flow downstream.  Returns
    ``(id_col, chunk_idx, chunk_text, n_words)``; the final short
    remainder chunk is kept when it has >= ``min_words`` NEW words
    (starts past the previous chunk), mirroring the usual tokenizer
    splitters.
    """
    if overlap_words >= chunk_words:
        raise ValueError("overlap must be smaller than chunk size")
    step = chunk_words - overlap_words
    toks = word_tokens(F.col(text_col))
    n = F.size(toks)
    # starts: 0, step, 2*step, ... while start < n (at least one chunk)
    n_chunks = F.greatest(
        F.ceil((n - F.lit(overlap_words)) / F.lit(step)), F.lit(1))
    starts = F.sequence(F.lit(0), (n_chunks - 1) * step, F.lit(step))
    d = df.select(
        F.col(id_col), toks.alias("__t__"),
        F.posexplode(starts).alias("chunk_idx", "__s__"))
    chunk = F.slice(F.col("__t__"), F.col("__s__") + 1, chunk_words)
    return (d.select(
        id_col, "chunk_idx",
        F.array_join(chunk, " ").alias("chunk_text"),
        F.size(chunk).alias("n_words"))
        .filter(F.col("n_words") >= min_words))
