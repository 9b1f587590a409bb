"""Data-mixture construction: cap each source at a token budget.

Training mixtures are specified as token budgets per domain ("20B from
web, 5B from code, ..."). This operator takes documents in a
deterministic pseudo-random order (md5 of the id) within each source
and keeps the prefix whose cumulative token count fits the source's
budget — reproducible downsampling to a target mixture, no RNG state.

A naive ``SUM() OVER (PARTITION BY source ORDER BY h)`` is a
scale-killer: one reducer owns an entire source's running sum (a "web"
source is most of the corpus).  Instead the prefix sum is hierarchical,
the standard two-phase scan:

1. docs are bucketed by the first two hex digits of their hash — the
   bucket id is a PREFIX of the sort key, so (bucket, h, id) order
   equals (h, id) order;
2. per-(source, bucket) token subtotals (one narrow partial-agg
   shuffle, ≤256 rows per source) are turned into bucket offsets by a
   window over those tiny aggregates;
3. offsets broadcast-join back and each bucket computes its LOCAL
   running sum in parallel — the widest window partition is
   1/256th of a source, not the whole source.

Semantically identical to the single-partition window; the oracle
checks it against exactly that.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

from apache_beam_spark.functions.text import word_tokens


def cap_tokens_per_source(df: DataFrame, budgets: dict[str, int],
                          default_budget: int,
                          source_col: str = "source",
                          id_col: str = "doc_id",
                          text_col: str = "text",
                          n_buckets: int = 256) -> DataFrame:
    """Keep a deterministic hash-ordered prefix of each source whose
    cumulative whitespace-token count fits the source's budget.

    Returns ``(id_col, source_col, n_tokens, cum_tokens)`` for the kept
    documents.  ``n_buckets`` must be a power of 16 step (2 hex digits
    => 256) — it is fixed at 256 here; the parameter documents intent.
    """
    if n_buckets != 256:
        raise ValueError("n_buckets is fixed at 256 (two hex digits)")

    budget: Column = F.lit(default_budget)
    for src, b in sorted(budgets.items()):
        budget = F.when(F.col(source_col) == src, F.lit(b)).otherwise(budget)

    h = F.md5(F.col(id_col).cast("string").cast("binary"))
    docs = df.select(
        F.col(id_col), F.col(source_col),
        F.size(word_tokens(F.col(text_col))).cast("bigint").alias("n_tokens"),
        h.alias("__h__"),
        F.substring(h, 1, 2).alias("__b__"))

    subtotal = docs.groupBy(source_col, "__b__").agg(
        F.sum("n_tokens").alias("__bt__"))
    offsets = subtotal.select(
        source_col, "__b__",
        F.coalesce(
            F.sum("__bt__").over(
                W.partitionBy(source_col).orderBy("__b__")
                .rowsBetween(W.unboundedPreceding, -1)),
            F.lit(0)).alias("__off__"))

    local = F.sum("n_tokens").over(
        W.partitionBy(source_col, "__b__")
        .orderBy("__h__", id_col)
        .rowsBetween(W.unboundedPreceding, 0))

    return (
        docs.join(F.broadcast(offsets), on=[source_col, "__b__"])
        .withColumn("cum_tokens", (F.col("__off__") + local).cast("bigint"))
        .filter(F.col("cum_tokens") <= budget)
        .select(id_col, source_col, "n_tokens", "cum_tokens")
    )


def temperature_budgets(df: DataFrame, total_budget: int,
                        temperature: float = 2.0,
                        source_col: str = "source",
                        text_col: str = "text") -> dict[str, int]:
    """Temperature-scaled mixture budgets (the UniMax / multilingual-LM
    recipe): source s gets ``total_budget * t_s^(1/T) / sum(t^(1/T))``
    tokens, where ``t_s`` is its natural token count — T=1 reproduces
    natural proportions, T→∞ uniform.  The per-source token counts are
    ONE partial-agg shuffle producing #sources rows; the driver only
    sees that kilobyte frame.

    T=2 (the default) uses ``sqrt``, which is correctly-rounded IEEE in
    every engine — budgets are then bit-reproducible cross-engine, and
    the result feeds ``cap_tokens_per_source`` unchanged.
    """
    import math

    if temperature <= 0:
        raise ValueError("temperature must be positive")
    counts = {r[source_col]: r["t"] for r in df.groupBy(source_col).agg(
        F.sum(F.size(word_tokens(F.col(text_col)))).alias("t")).collect()}
    if temperature == 2.0:
        scaled = {s: math.sqrt(float(t)) for s, t in counts.items()}
    else:
        scaled = {s: float(t) ** (1.0 / temperature)
                  for s, t in counts.items()}
    # sequential left-fold in source order: reproducible in SQL as
    # SUM(x ORDER BY source), unlike an unordered double sum
    z = sum(scaled[s] for s in sorted(scaled))
    return {s: int(total_budget * v / z) for s, v in scaled.items()}
