"""DSIR — Data Selection with Importance Resampling (Xie et al.,
NeurIPS 2023) over hashed n-gram features.

Given a small TARGET corpus (the domain you want more of) and the RAW
corpus, DSIR scores every raw document by the log-likelihood ratio of
its hashed n-gram features under bag-of-ngrams models of the two
distributions, then keeps the highest-ratio documents — the standard
recipe for domain-targeted pretraining-data selection.

Spark-first shape (everything stays in Column ops):

* featurization: unigram + bigram word features hashed into
  ``n_buckets`` buckets via md5 (cross-engine reproducible — the
  md5-twin discipline of the dedup family);
* the two distributions collapse to ONE ``n_buckets``-bounded count
  frame each (never corpus-sized), Laplace-smoothed;
* the per-bucket log ratio ``ln(p_b / q_b)`` is quantized to an int64
  weight (* 2^16) so every downstream sum is exact integer math, and
  the per-document score is one explode + broadcast-join + sum — a
  single shuffle carrying (doc_id, partial score).

``dsir_scores`` is value-oracled in DuckDB (`dsir_scores` in
__spark_entry__) — same md5 buckets, same smoothing, same
quantization; ``dsir_select`` keeps the top fraction with a
deterministic (score desc, doc_id) tie-break.

At 100 TB: the weight table is 4096 rows (broadcast), the raw corpus
is touched once for counting (one partial-agg shuffle of at most
n_buckets rows per partition) and once for scoring.

Reference anchor: the reference repo has no data-selection operator;
this is training-data-pipeline surface (SURVEY §8 extras) built on
its Combine-per-key shapes (sdks/java/core/.../Combine.java:113).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.functions.text import word_tokens

#: fixed-point scale for the quantized log-ratio weights
_W_SCALE = 1 << 16


def _feature_buckets(text: Column, n_buckets: int) -> Column:
    """array<int> of hashed unigram+bigram bucket ids (with
    multiplicity): bucket = first 24 bits of md5(feature) mod
    n_buckets; bigrams join with a space (never inside a word
    token)."""
    toks = word_tokens(text)
    shifted = F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0)))
    bigrams = F.filter(
        F.zip_with(toks, shifted,
                   lambda a, b: F.when(b.isNotNull(),
                                       F.concat(a, F.lit(" "), b))),
        lambda x: x.isNotNull())
    feats = F.concat(toks, bigrams)
    return F.transform(
        feats,
        lambda s: (F.conv(F.substring(F.md5(s), 1, 6), 16, 10)
                   .cast("long") % n_buckets).cast("int"))


def dsir_featurize(df: DataFrame, *, n_buckets: int = 4096,
                   text_col: str = "text",
                   id_col: str = "doc_id") -> DataFrame:
    """(id_col, bucket) with multiplicity — the featurization pass
    shared by weight fitting and scoring (optimization r13, guide
    §1.2: the md5 bucket transform is the expensive stage, and the
    original composition ran it once for the q-counts and AGAIN for
    the per-doc scores over the same corpus).  ``explode_outer`` keeps
    feature-less docs as a null-bucket row so scoring sees every doc;
    count consumers filter the nulls out."""
    return df.select(
        F.col(id_col),
        F.explode_outer(_feature_buckets(F.col(text_col), n_buckets))
        .alias("bucket"))


def _bucket_counts_from(feats: DataFrame) -> DataFrame:
    """(bucket, cnt) from a featurized frame — one partial-agg
    shuffle, output bounded by n_buckets."""
    return (feats.filter(F.col("bucket").isNotNull())
            .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


def _bucket_counts(df: DataFrame, text_col: str,
                   n_buckets: int) -> DataFrame:
    """(bucket, cnt) over a corpus — one explode + one partial-agg
    shuffle, output bounded by n_buckets."""
    return (df.select(F.explode(
        _feature_buckets(F.col(text_col), n_buckets)).alias("bucket"))
        .groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt")))


def dsir_weights(raw_df: DataFrame, target_df: DataFrame, *,
                 n_buckets: int = 4096,
                 text_col: str = "text",
                 raw_feats: DataFrame | None = None,
                 target_feats: DataFrame | None = None) -> DataFrame:
    """(bucket, w): int64-quantized per-bucket log-likelihood ratios
    ``round((ln(p_b / P) - ln(q_b / Q)) * 2^16)`` with Laplace +1
    smoothing — p from the target corpus, q from the raw corpus.
    Exactly ``n_buckets`` rows (absent buckets get the smoothed
    floor), so the artifact always broadcasts.  Pass ``raw_feats`` /
    ``target_feats`` (from :func:`dsir_featurize`) to reuse an
    already-featurized frame instead of re-running the md5 transform
    per count pass."""
    buckets = raw_df.sparkSession.range(n_buckets) \
        .select(F.col("id").cast("int").alias("bucket"))
    p = (_bucket_counts_from(target_feats) if target_feats is not None
         else _bucket_counts(target_df, text_col, n_buckets)) \
        .withColumnRenamed("cnt", "pc")
    q = (_bucket_counts_from(raw_feats) if raw_feats is not None
         else _bucket_counts(raw_df, text_col, n_buckets)) \
        .withColumnRenamed("cnt", "qc")
    j = (buckets.join(p, "bucket", "left").join(q, "bucket", "left")
         .select("bucket",
                 (F.coalesce(F.col("pc"), F.lit(0)) + 1).alias("pc"),
                 (F.coalesce(F.col("qc"), F.lit(0)) + 1).alias("qc")))
    # totals ride as a broadcast one-row scalar join (the rfm/zscore
    # stats pattern) instead of driver pulls — the whole weight table
    # stays one lazy plan
    totals = j.agg(F.sum("pc").cast("double").alias("ptot"),
                   F.sum("qc").cast("double").alias("qtot"))
    w = F.round((F.log(F.col("pc") / F.col("ptot"))
                 - F.log(F.col("qc") / F.col("qtot")))
                * _W_SCALE).cast("long")
    return (j.crossJoin(F.broadcast(totals))
            .select("bucket", w.alias("w")))


def dsir_scores(df: DataFrame, weights: DataFrame, *,
                n_buckets: int = 4096, text_col: str = "text",
                id_col: str = "doc_id",
                feats: DataFrame | None = None) -> DataFrame:
    """(id_col, dsir_score): per-document sum of its feature buckets'
    quantized log-ratio weights (higher = more target-like).  One
    explode + a broadcast join against the n_buckets-row weight table
    + one keyed sum; documents with no features score 0.  ``feats``
    (from :func:`dsir_featurize`) skips re-featurizing a corpus the
    weight fit already transformed."""
    per = (feats if feats is not None
           else df.select(F.col(id_col),
                          F.explode_outer(
                              _feature_buckets(F.col(text_col), n_buckets))
                          .alias("bucket"))) \
        .join(F.broadcast(weights), "bucket", "left")
    return (per.groupBy(id_col)
            .agg(F.coalesce(F.sum("w"), F.lit(0)).cast("long")
                 .alias("dsir_score")))


def dsir_select(df: DataFrame, weights: DataFrame, *, frac: float,
                n_buckets: int = 4096, text_col: str = "text",
                id_col: str = "doc_id",
                feats: DataFrame | None = None) -> DataFrame:
    """The kept top-``frac`` slice by DSIR score, deterministic
    tie-break (score desc, id).

    The global rank is computed WITHOUT a single-partition window
    funnel (an unpartitioned ``row_number`` drags the whole score
    frame through one task — the thing that dies first at 100 TB):
    range-repartition on (score desc, id), sort within partitions,
    pull the PARTITION-SIZED count vector to the driver (bounded by
    shuffle partitions, the k-means-centroid precedent), and add each
    partition's cumulative offset to a partition-local row_number.
    Only (id, score) pairs shuffle; the text never moves."""
    from pyspark.sql import Window

    if not 0 < frac <= 1:
        raise ValueError(f"frac must be in (0, 1], got {frac}")
    # checkpoint AFTER the range exchange: the count, the offset pull
    # and the caller's action are three jobs — without this each one
    # would recompute the whole scoring pipeline (plus the lazy weight
    # plan's two corpus scans), and repartitionByRange RE-SAMPLES its
    # bounds per execution, so the pid->offset map could describe a
    # different partitioning than the one the final filter reads
    scores = dsir_scores(df, weights, n_buckets=n_buckets,
                         text_col=text_col, id_col=id_col, feats=feats)
    parts = (scores.repartitionByRange(F.col("dsir_score").desc(),
                                       F.col(id_col))
             .withColumn("pid", F.spark_partition_id())
             .localCheckpoint())
    n = parts.count()
    keep = max(1, int(n * frac))
    sizes = {r["pid"]: r["c"] for r in
             parts.groupBy("pid").agg(F.count(F.lit(1)).alias("c"))
             .collect()}
    offsets, run = {}, 0
    for pid in sorted(sizes):
        offsets[pid] = run
        run += sizes[pid]
    off = F.element_at(
        F.create_map(*[F.lit(x) for pid in sorted(offsets)
                       for x in (pid, offsets[pid])]),
        F.col("pid"))
    w = Window.partitionBy("pid").orderBy(F.col("dsir_score").desc(),
                                          F.col(id_col))
    return (parts.withColumn("rk", off + F.row_number().over(w))
            .where(F.col("rk") <= keep)
            .select(id_col, "dsir_score"))
