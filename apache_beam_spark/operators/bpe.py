"""Distributed BPE tokenizer training primitives.

Byte-pair encoding (Sennrich et al., ACL 2016) trains a subword
vocabulary by repeatedly merging the most frequent adjacent symbol
pair across the corpus.  At 100 TB the corpus never fits a trainer
process, but the algorithm distributes naturally:

* the WORD VOCABULARY (word -> count) is tiny relative to the corpus —
  one shuffle agg compresses terabytes of text into the frame every
  later step runs on (the standard word-level BPE formulation: merges
  never cross word boundaries);
* each iteration is one partial-agg pair count over the vocabulary
  plus a driver-side top-1 (a bounded scalar, the same precedent as
  k-means centroids / CC convergence counters) and a pure-Column fold
  that applies the merge — no Python UDFs anywhere.

``bpe_pair_counts`` (the first iteration's counting step) is fully
SQL-expressible and value-oracled against DuckDB; the iterative
``bpe_train`` loop is verified against a reference Python
implementation in tests/test_bpe.py (ties broken deterministically by
(count desc, a, b), so both implementations agree exactly).

Reference anchor: the reference repo has no tokenizer-training
operator; this is part of the training-data-pipeline surface
(SURVEY §8 extras), built on its Combine-per-key shapes.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.functions.text import word_tokens


def word_vocab(df: DataFrame, text_col: str = "text") -> DataFrame:
    """(word, cnt): lower-cased word-token frequencies — the corpus
    compression every BPE step runs on.  One explode + one shuffle agg
    with map-side partial aggregation."""
    return (df.select(F.explode(word_tokens(F.col(text_col))).alias("word"))
            .groupBy("word").agg(F.count(F.lit(1)).alias("cnt")))


def _symbols(word: Column) -> Column:
    """Initial BPE symbolization: one single-character symbol per
    character."""
    return F.regexp_extract_all(word, F.lit("(.)"), 1)


def _adjacent_pairs(syms: Column) -> Column:
    """array<struct<a,b>> of adjacent symbol pairs (linear zip with the
    shifted array — same shape as functions/text.bigrams)."""
    shifted = F.slice(syms, 2, F.greatest(F.size(syms) - 1, F.lit(0)))
    pairs = F.zip_with(syms, shifted,
                       lambda a, b: F.struct(a.alias("a"), b.alias("b")))
    return F.filter(pairs, lambda p: p["b"].isNotNull())


def _pair_counts(vocab_syms: DataFrame) -> DataFrame:
    """(a, b, pair_count) over a (cnt, syms) vocabulary frame.  The
    shuffle carries (a, b, partial count) — never the corpus, never
    the vocabulary arrays."""
    return (vocab_syms
            .select("cnt", F.explode(_adjacent_pairs(F.col("syms"))).alias("p"))
            .groupBy(F.col("p.a").alias("a"), F.col("p.b").alias("b"))
            .agg(F.sum("cnt").alias("pair_count")))


def bpe_pair_counts(df: DataFrame, text_col: str = "text",
                    min_count: int = 1) -> DataFrame:
    """Adjacent symbol-pair frequencies of the INITIAL (character)
    symbolization, weighted by word frequency — BPE iteration zero's
    counting step, fully value-oracled (see ``bpe_pair_counts`` in
    ``__spark_entry__.oracle_sql``).  Returns (a, b, pair_count)."""
    vocab = word_vocab(df, text_col).select(
        "cnt", _symbols(F.col("word")).alias("syms"))
    out = _pair_counts(vocab)
    if min_count > 1:
        out = out.filter(F.col("pair_count") >= min_count)
    return out


def _apply_merge(syms: Column, a: str, b: str) -> Column:
    """Greedy left-to-right application of one merge (a, b) -> a+b to a
    symbol array, as a pure-Column fold: the accumulator carries the
    rebuilt prefix and one pending symbol; a pending ``a`` followed by
    ``b`` emits the merged symbol and clears the pending slot, so
    overlapping occurrences (e.g. ``aaa`` under (a, a)) merge
    left-to-right non-overlapping — exactly the reference BPE rule."""
    init = F.struct(
        F.array().cast("array<string>").alias("out"),
        F.lit(None).cast("string").alias("prev"))

    def step(acc, s):
        hit = acc["prev"].eqNullSafe(F.lit(a)) & (s == F.lit(b))
        flushed = F.when(acc["prev"].isNull(), acc["out"]) \
            .otherwise(F.concat(acc["out"], F.array(acc["prev"])))
        return F.struct(
            F.when(hit, F.concat(acc["out"], F.array(F.lit(a + b))))
            .otherwise(flushed).alias("out"),
            F.when(hit, F.lit(None).cast("string")).otherwise(s).alias("prev"))

    def finish(acc):
        return F.when(acc["prev"].isNull(), acc["out"]) \
            .otherwise(F.concat(acc["out"], F.array(acc["prev"])))

    return F.aggregate(syms, init, step, finish)


#: delimiter bytes for the replace-chain encoder: symbol boundary and
#: word boundary — neither can appear inside a word token
#: (``word_tokens`` admits only letters/digits/_/')
_SEP = "\x1f"
_WSEP = "\x1e"


def bpe_encode_token_counts(df: DataFrame, merges: list,
                            text_col: str = "text",
                            id_col: str = "doc_id") -> DataFrame:
    """Per-document token count under a FIXED, already-learned merge
    list — the tokenizer-APPLICATION side of BPE (the
    ``kmeans_assign``-with-fixed-centroids pattern: pinning the learned
    artifact makes the whole path value-oracle-checkable).

    Encoding never touches Python: each word's characters are joined
    with double \\x1f delimiters inside single-\\x1f anchors, and each
    merge (a, b) -> ab is ONE codegen ``replace`` of
    ``\\x1f a \\x1f\\x1f b \\x1f`` with ``\\x1f ab \\x1f`` — string
    replace is left-to-right non-overlapping, which IS the greedy BPE
    rule, and the shared anchor byte between adjacent pairs makes
    back-to-back occurrences merge correctly (``aaa`` -> ``aa, a``).
    Word boundaries use \\x1e so merges never cross words.  Token
    count = words + remaining double-delimiter boundaries / 2.

    Returns (id_col, n_tokens)."""
    import functools

    toks = word_tokens(F.col(text_col))

    def enc_word(w):
        inner = F.regexp_replace(w, "(.)", "$1" + _SEP + _SEP)
        return F.concat(F.lit(_SEP),
                        F.substring(inner, 1, F.length(inner) - 2),
                        F.lit(_SEP))

    s = F.array_join(F.transform(toks, enc_word), _WSEP)
    s = functools.reduce(
        lambda acc, m: F.replace(
            acc, F.lit(_SEP + m[0] + _SEP + _SEP + m[1] + _SEP),
            F.lit(_SEP + m[0] + m[1] + _SEP)),
        merges, s)
    boundaries = (F.length(s)
                  - F.length(F.replace(s, F.lit(_SEP + _SEP), F.lit("")))) / 2
    return df.select(
        F.col(id_col),
        (F.size(toks) + boundaries).cast("long").alias("n_tokens"))


def bpe_train(df: DataFrame, text_col: str = "text",
              n_merges: int = 10) -> DataFrame:
    """Learn ``n_merges`` BPE merges over the corpus; returns
    (rank, a, b, merged, pair_count) in merge order.

    Each iteration: one pair-count shuffle over the (checkpointed)
    vocabulary + one driver top-1 (deterministic tie-break: highest
    count, then lexicographic (a, b)) + one Column-fold rewrite.  The
    vocabulary is ``localCheckpoint``ed every iteration so plan depth
    stays flat across merges (the iterative-op discipline of
    ``operators/graph.py``).  Stops early when no adjacent pair
    remains.  Iterative + driver-scalar per round, so this is a
    rows-only surface (no SQL oracle); exactness vs the sequential
    reference algorithm is pinned by tests/test_bpe.py."""
    spark = df.sparkSession
    vocab = word_vocab(df, text_col).select(
        "cnt", _symbols(F.col("word")).alias("syms")).localCheckpoint()
    merges = []
    for rank in range(n_merges):
        top = (_pair_counts(vocab)
               .orderBy(F.col("pair_count").desc(), "a", "b")
               .limit(1).collect())
        if not top:
            break
        r = top[0]
        merges.append((rank, r["a"], r["b"], r["a"] + r["b"],
                       int(r["pair_count"])))
        vocab = vocab.select(
            "cnt", _apply_merge(F.col("syms"), r["a"], r["b"]).alias("syms")
        ).localCheckpoint()
    return spark.createDataFrame(
        merges, "rank int, a string, b string, merged string, pair_count long")
