"""Exact duplicate-substring scrubbing at word granularity.

The document-level dedup family (exact / MinHash / SimHash / n-gram
Jaccard) drops WHOLE documents, and ``dedup/chunks.py`` dedups
disjoint 10-word passages — but the dominant redundancy in crawl
corpora is repeated SPANS inside otherwise-distinct documents
(licenses, navigation boilerplate, quoted blocks).  Removing exact
repeated substrings of >= N tokens, keeping one occurrence, is the
"deduplicating training data makes language models better" operation
(Lee et al., ACL 2022 — there with suffix arrays); this is the
distributed word-granularity formulation:

1. every length-``min_len`` token window (OVERLAPPING, stride 1) is
   keyed by the md5 of its space-joined words — one narrow
   ``(gram, doc, pos)`` shuffle, the text itself never moves;
2. a gram that occurs more than once in the corpus keeps its FIRST
   occurrence (min (doc_id, pos)) and flags every other start;
3. a token position is removed iff some flagged start covers it —
   computed per document as ONE running ``max`` window over the
   previous ``min_len - 1`` positions (interval union without
   exploding flagged windows into min_len rows each);
4. surviving tokens reassemble in order (the sorted-struct
   ``collect_list`` idiom) — a doc that is entirely a copy of earlier
   content comes back EMPTY, partial copies lose exactly the
   duplicated spans.

Everything is Column functions + three keyed shuffles (gram agg,
flag join, doc rebuild); md5 keys make the whole pipeline
value-oracle-checkable in DuckDB (``dup_span_scrub`` in
``__spark_entry__``).  At 100 TB the gram shuffle carries
16-byte-hash rows — ``min_len`` governs both sensitivity and the
number of rows (n_tokens - min_len + 1 per doc).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from apache_beam_spark.functions.text import word_tokens

#: keeper-identity packing: (doc_id, pos) -> one orderable int64.
#: Valid while docs stay under 10M tokens — far beyond any document
#: this engine shards (repartition_for_media splits larger payloads).
_POS_BASE = 10_000_000


def dup_span_scrub(df: DataFrame, text_col: str = "text",
                   id_col: str = "doc_id",
                   min_len: int = 20) -> DataFrame:
    """Scrub every non-first occurrence of any exact >= ``min_len``-token
    repeated substring.  Returns (id_col, clean_text, n_tokens,
    n_removed) — ``clean_text`` is the surviving tokens space-joined,
    ``n_removed`` how many token positions were scrubbed."""
    from apache_beam_spark.plans.partitioning import parallelize_narrow

    # the per-window md5 transform below is the CPU-heavy stage and a
    # small corpus arrives as ONE parquet split — parallelize first
    # (no-op at scale, where the scan already has many splits); each
    # input token is re-hashed by ~min_len overlapping windows, hence
    # the amplification weight
    from apache_beam_spark.plans.caching import cache_scoped

    # the tokenized frame feeds TWO consumers (the gram pass and the
    # per-token rebuild); uncached, each re-ran the single-split scan +
    # tokenize serially (optimization r13, guide §1.2: don't compute
    # things twice).  Token-sized like corpus_prep's uniq cache.
    toks = cache_scoped(parallelize_narrow(
        df.select(F.col(id_col).alias("id"),
                  word_tokens(F.col(text_col)).alias("w")),
        weight=min_len))

    # one row per overlapping min_len-gram start; sequence() counts
    # DOWN for a negative span, so short docs must short-circuit to an
    # empty gram array instead
    gram_arr = F.when(
        F.size("w") >= min_len,
        F.transform(
            F.sequence(F.lit(0), F.size("w") - min_len),
            lambda i: F.md5(F.encode(
                F.concat_ws(" ", F.slice("w", i + 1, min_len)), "UTF-8")),
        )).otherwise(F.array().cast("array<string>"))
    grams = toks.select("id", F.posexplode(gram_arr).alias("p", "gh"))

    # duplicated grams: every occurrence except the global first
    # (min (doc, pos)) is a flagged start.  ONE window pass over one
    # gh-keyed shuffle (optimization r13, guide §2.4): the old
    # groupBy + join-back evaluated the md5 gram transform — the
    # CPU-heavy stage — twice (once per plan branch), and its
    # ``.distinct()`` re-shuffled rows that are already unique by
    # construction (posexplode emits each (id, p) once).  Same flagged
    # set: keeper/c here are the window twins of the old aggregate.
    key = F.col("id") * _POS_BASE + F.col("p")
    gw = W.partitionBy("gh")
    flagged = (grams
               .withColumn("keeper", F.min(key).over(gw))
               .withColumn("c", F.count(F.lit(1)).over(gw))
               .filter((F.col("c") > 1) & (key != F.col("keeper")))
               .select("id", "p")
               .withColumn("flag", F.lit(1)))

    # per token position: removed iff a flagged start lies in the
    # previous min_len - 1 positions (positions are dense 0..n-1, so a
    # ROWS frame is exact interval union)
    pos = toks.select("id", F.posexplode("w").alias("p", "word"))
    win = (W.partitionBy("id").orderBy("p")
           .rowsBetween(-(min_len - 1), 0))
    marked = (pos.join(flagged, on=["id", "p"], how="left")
              .withColumn("rm", F.max(F.coalesce("flag", F.lit(0))).over(win)))

    kept_text = F.concat_ws(" ", F.transform(
        F.array_sort(F.collect_list(F.when(
            F.col("rm") == 0, F.struct("p", "word")))),
        lambda s: s["word"]))
    out = (marked.groupBy("id")
           .agg(kept_text.alias("clean_text"),
                F.count(F.lit(1)).alias("n_tokens"),
                F.sum("rm").alias("n_removed")))
    # docs with zero tokens never appear in pos — restore them empty
    return (df.select(F.col(id_col).alias("id"))
            .join(out, on="id", how="left")
            .select(F.col("id").alias(id_col),
                    F.coalesce("clean_text", F.lit("")).alias("clean_text"),
                    F.coalesce("n_tokens", F.lit(0)).cast("long")
                    .alias("n_tokens"),
                    F.coalesce("n_removed", F.lit(0)).cast("long")
                    .alias("n_removed")))
