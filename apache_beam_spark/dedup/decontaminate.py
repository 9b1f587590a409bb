"""Benchmark decontamination: flag corpus documents that overlap an
evaluation/benchmark set by shared word n-grams.

The standard training-data hygiene step (n-gram collision
decontamination, as popularized by the GPT-3 and PaLM dataset reports):
a document is contaminated when a large-enough fraction of its distinct
n-grams also appears in any benchmark document.

Spark shape, sized for a 100 TB corpus vs a small benchmark:

* the benchmark's distinct n-gram set is computed once and hash-joined
  **broadcast** against the corpus grams (benchmarks are MBs, corpora
  are TBs — never shuffle the corpus against them);
* the corpus text column never shuffles: only narrow ``(id, gram)``
  pairs flow, and membership is resolved map-side by the broadcast
  join, so the whole job is ONE shuffle (the per-doc count);
* ``count(*)`` of the exploded distinct grams doubles as the per-doc
  gram count — no second pass over the text.

With ``broadcast_benchmark=False`` the membership join becomes a
shuffle hash join for benchmark sets too big to broadcast (e.g.
decontaminating against another corpus); same semantics, one extra
shuffle on the gram key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.functions.text import shingles


def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                  text_col: str = "text", id_col: str = "doc_id",
                  shingle_k: int = 5, threshold: float = 0.5,
                  broadcast_benchmark: bool = True) -> DataFrame:
    """Per-document benchmark-overlap report.

    Returns ``(id_col, n_grams, n_matched, contamination, contaminated)``
    where ``contamination = n_matched / n_grams`` over the document's
    DISTINCT word ``shingle_k``-grams and ``contaminated`` is
    ``contamination >= threshold``.  Documents shorter than ``shingle_k``
    words contribute their whole text as a single gram (same convention
    as :func:`apache_beam_spark.functions.text.shingles`).
    """
    bench_grams = (
        benchmark.select(
            F.explode(F.array_distinct(shingles(F.col(text_col), shingle_k)))
            .alias("__g__"))
        .distinct()
        .withColumn("__hit__", F.lit(1)))
    if broadcast_benchmark:
        bench_grams = F.broadcast(bench_grams)

    from apache_beam_spark.plans.partitioning import parallelize_narrow

    # the corpus-side shingle pass is the operator's CPU and a small
    # corpus scans as ONE split — fan out first (no-op at scale;
    # optimization r13, the miner-family discipline)
    grams = parallelize_narrow(
        corpus.select(F.col(id_col), F.col(text_col)), weight=8).select(
        F.col(id_col),
        F.explode(F.array_distinct(shingles(F.col(text_col), shingle_k)))
        .alias("__g__"))

    return (
        grams.join(bench_grams, on="__g__", how="left")
        .groupBy(id_col)
        .agg(F.count(F.lit(1)).alias("n_grams"),
             F.coalesce(F.sum("__hit__"), F.lit(0)).alias("n_matched"))
        .withColumn("contamination",
                    F.round(F.col("n_matched") / F.col("n_grams"), 6))
        .withColumn("contaminated", F.col("contamination") >= F.lit(threshold))
    )
