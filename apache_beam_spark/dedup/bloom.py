"""Bloom-filter-pruned incremental dedup.

The "new batch vs. huge history" pattern: deduping a day's crawl
against a 100 TB corpus with a plain anti join shuffles the whole new
batch's keys against the whole history's keys.  A Bloom filter over
the history keys is KBs-to-GBs (vs. the corpus), broadcasts, and
answers "definitely not seen" with zero error — so the (typically
vast) non-duplicate majority of the batch passes through WITHOUT any
shuffle, and only Bloom-positive rows (true dups + the fpp sliver of
false positives) enter an exact anti-join verify.  The final result
is EXACTLY the plain anti join (the filter only prunes, never
decides), so the operator stays value-oracled.

Spark-first mechanics (this build exposes no ``bloom_filter_agg``
SQL function, and row-at-a-time Python membership UDFs are the slow
path, so the filter is built from plain relational pieces):
- BUILD: each history key emits its k probe positions
  (``pmod(xxhash64(key, i), m)``), positions fold into 64-bit words
  via ``groupBy(word_idx).agg(bit_or(mask))`` — one map-side-combined
  shuffle of (word, mask) pairs, output <= m/64 rows.  The bitmap is
  a persistable DataFrame artifact: build once, reuse every ingest
  batch (the real win over Spark's per-join runtime filters).
- PROBE: k broadcast equi-joins of the batch against the bitmap (one
  per probe), then a single codegen'd bitwise AND filter.  No
  shuffle of the batch, no Python in the hot path; absent words
  coalesce to 0 = definitely-absent.
- SIZING: standard m = -n ln(fpp)/ln(2)^2, k = (m/n) ln 2; at
  n = 10^9 history keys and fpp 1% the bitmap is ~1.2 GB — still
  broadcastable on real executors, and far under the history scan it
  replaces per batch.  Beyond that, partition the history and AND
  per-partition verdicts (out of scope here).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bloom_params(expected: int, fpp: float = 0.01) -> tuple[int, int]:
    """(num_bits, k) for an expected key count and false-positive rate."""
    expected = max(expected, 1)
    m = int(math.ceil(-expected * math.log(fpp) / (math.log(2) ** 2)))
    m = max(m, 64)
    k = max(1, int(round(m / expected * math.log(2))))
    return m, k


def _positions(key: Column, num_bits: int, k: int) -> list[Column]:
    return [F.pmod(F.xxhash64(key, F.lit(i)), F.lit(num_bits))
            for i in range(k)]


def bloom_build(history: DataFrame, key_col: str, num_bits: int,
                k: int) -> DataFrame:
    """Aggregate the history's probe positions into a (word_idx, word)
    bitmap frame (<= num_bits/64 rows) — the persistable artifact."""
    pos = F.explode(F.array(*_positions(F.col(key_col), num_bits, k)))
    return (history.select(pos.alias("__pos__"))
            .select((F.col("__pos__") / 64).cast("long").alias("word_idx"),
                    F.expr("shiftleft(1L, cast(__pos__ % 64 as int))")
                    .alias("mask"))
            .groupBy("word_idx").agg(F.bit_or("mask").alias("word")))


def bloom_might_contain(df: DataFrame, bitmap: DataFrame, key_col: str,
                        num_bits: int, k: int,
                        flag_col: str = "__might__") -> DataFrame:
    """Add ``flag_col``: False = key definitely not in the history.

    k broadcast joins against the tiny bitmap + one bitwise filter;
    the probed frame itself never shuffles."""
    out = df
    checks = []
    for i, pos in enumerate(_positions(F.col(key_col), num_bits, k)):
        w, widx = f"__w{i}__", f"__wi{i}__"
        bm = bitmap.select(F.col("word_idx").alias(widx),
                           F.col("word").alias(w))
        out = (out.withColumn(widx, (pos / 64).cast("long"))
               .withColumn(f"__b{i}__", (pos % 64).cast("int"))
               .join(F.broadcast(bm), on=widx, how="left"))
        checks.append(
            F.expr(f"shiftright(coalesce({w}, 0L), __b{i}__) & 1L = 1L"))
        out = out.drop(widx)
    flag = checks[0]
    for c in checks[1:]:
        flag = flag & c
    out = out.withColumn(flag_col, flag)
    return out.drop(*[c for i in range(k) for c in (f"__w{i}__", f"__b{i}__")])


#: bitmaps at or under this many BITS ((bits/64) 16-byte map entries,
#: so 2^28 bits = 4M entries = 64 MB) probe via the single-row map
#: broadcast; larger ones fall back to the k-join probe, whose
#: broadcast is a plain multi-row frame with no single-row size cap.
_MAP_PROBE_MAX_BITS = 1 << 28


def bloom_might_contain_map(df: DataFrame, bitmap: DataFrame,
                            key_col: str, num_bits: int, k: int,
                            flag_col: str = "__might__") -> DataFrame:
    """``bloom_might_contain`` for map-sized bitmaps (optimization
    r13): the (word_idx, word) frame folds into ONE ``map<long,long>``
    row and broadcasts once — the repo's scalar-broadcast crossJoin
    shape — and all k probes become ``element_at`` lookups in a single
    codegen'd predicate.  One join node and one broadcast regardless
    of k, where the k-join probe costs k BroadcastHashJoins PER
    EVALUATION of the frame (and ``bloom_anti_join`` evaluates it
    twice, once per branch of the clean/suspect split) — the analyzer
    and optimizer walk that 2k-join tree on every action.  Same probe
    positions, same verdict, bit-for-bit."""
    bm = bitmap.agg(F.map_from_entries(F.collect_list(F.struct(
        F.col("word_idx").alias("k"), F.col("word").alias("v"))))
        .alias("__bm__"))
    terms = []
    for i in range(k):
        p = f"pmod(xxhash64({key_col}, {i}), {num_bits}L)"
        terms.append(
            f"(shiftright(coalesce(element_at(__bm__, {p} div 64), 0L), "
            f"cast({p} % 64 as int)) & 1L) = 1L")
    flag = F.expr(" AND ".join(terms))
    return (df.crossJoin(F.broadcast(bm))
            .withColumn(flag_col, flag).drop("__bm__"))


def bloom_anti_join(new: DataFrame, history: DataFrame, key_col: str,
                    fpp: float = 0.01, expected: int | None = None,
                    num_bits: int | None = None,
                    k: int | None = None) -> DataFrame:
    """EXACT ``new ANTI JOIN history USING (key_col)``, Bloom-pruned.

    Definitely-absent rows pass straight through (no shuffle);
    Bloom-positive rows are verified by a real anti join, so false
    positives never survive and the result is oracle-identical to the
    plain anti join."""
    if num_bits is None or k is None:
        if expected is None:
            expected = history.count()
        num_bits, k = bloom_params(expected, fpp)
    bitmap = bloom_build(history, key_col, num_bits, k)
    if num_bits <= _MAP_PROBE_MAX_BITS:
        flagged = bloom_might_contain_map(new, bitmap, key_col, num_bits, k)
    else:
        flagged = bloom_might_contain(new, bitmap, key_col, num_bits, k)
    clean = flagged.filter(~F.col("__might__")).drop("__might__")
    suspects = flagged.filter(F.col("__might__")).drop("__might__")
    verified = suspects.join(history.select(key_col).distinct(),
                             on=key_col, how="left_anti")
    return clean.unionByName(verified)
