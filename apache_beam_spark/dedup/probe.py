"""Corpus-level clone-flood probe, shared by every near-dup miner.

Round-5 gave each miner its own ``collapse='auto'`` probe — an eager
aggregation over that miner's cached internal frame (ranked postings,
minhash signatures, simhash table) at plan-BUILD time.  Correct, but
the cost did not amortize: in an end-to-end suite every family member
paid its own probe job (+15-35% wall on clean corpora, VERDICT r5
finding 1).  The observation that fixes it: every miner's clone
equivalence is a COARSENING of token-stream identity —

    identical token stream  =>  identical shingle multiset
                            =>  identical (max_df-pruned) shingle set
                            =>  identical MinHash signature
                            =>  identical SimHash

so ONE probe over ``xxhash64(concat_ws(' ', word_tokens(text)))``
answers the flood question for the n-gram, containment, MinHash and
SimHash miners at once, straight off the source table (one scan, one
narrow hash agg — no shingling, no windows, no miner-internal cache
materialization), and the result is MEMOIZED per logical plan
(``DataFrame.semanticHash()``), so the first family member pays ~one
small job and the rest of the suite reads a dict.

Bias and safety: token-stream grouping REFINES each miner's own clone
grouping, so the probe can only under-count clones that arise from the
miner's extra normalization (e.g. two docs identical only after max_df
pruning).  Under-counting errs toward the DIRECT plan, which is always
correct — ``collapse``/``has_dups`` choose a physical strategy, never
the answer (all modes produce identical output, asserted in
tests/test_ngram_modes.py) — and the over-cap bucket discipline
(``dedup/buckets.bucket_pairs``: chunk + triangle-split, never drop)
still bounds per-task width if an exotic flood slips past the probe.
The flood shape the collapse exists for — exact-copy boilerplate at
crawl scale (SCALING.md r5) — is token-stream-identical by
construction and always detected.

Memo scope: per process, keyed by the canonicalized plan hash.  A
plan-hash collision (or a file mutated in place under an unchanged
path) can only mis-route the plan CHOICE, not the answer.  Call
``clear_probe_memo()`` after rewriting a table a memoized plan reads.
"""

from __future__ import annotations

import threading
from typing import Dict, Tuple

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from apache_beam_spark.functions.text import word_tokens

_LOCK = threading.Lock()
_MEMO: Dict[Tuple[int, str], object] = {}


def memoize_plan_stat(df: DataFrame, kind: str, compute):
    """Memoize an eager plan-build-time probe result, keyed by the
    frame's canonicalized plan hash + a probe kind tag.  ``compute``
    runs at most once per (plan, kind) per process; probes elsewhere
    (``similarity/knn.py``'s vector-dup probe) share this registry so
    ``clear_probe_memo`` drains everything."""
    key = (df.semanticHash(), kind)
    with _LOCK:
        if key in _MEMO:
            return _MEMO[key]
    val = compute()
    with _LOCK:
        _MEMO[key] = val
    return val


def corpus_clone_stats(df: DataFrame, text_col: str = "text") -> Tuple[int, float]:
    """(widest token-stream-identical group, fraction of docs that are
    non-representative members of one) — memoized per logical plan.

    The key hashes the token STREAM (``word_tokens``: lower-cased
    ``[\\p{L}\\p{N}_']+`` runs), not the raw bytes, so whitespace /
    punctuation / case variants of the same boilerplate — the common
    crawl flood — group together exactly as they do inside the miners.
    """

    def compute() -> Tuple[int, float]:
        from apache_beam_spark.plans.partitioning import parallelize_narrow

        # the tokenize+hash is the probe's CPU (a regex pass over every
        # byte of text); a single-row-group parquet source otherwise
        # scans as ONE task and runs it serial (optimization r13,
        # guide §2) — fan out like the miners it fronts for
        src = parallelize_narrow(df.select(F.col(text_col)), weight=8)
        row = (src.select(F.xxhash64(
                   F.concat_ws(" ", word_tokens(F.col(text_col)))).alias("__k__"))
               .groupBy("__k__").agg(F.count(F.lit(1)).alias("__c__"))
               .agg(F.max("__c__").alias("wmax"),
                    F.sum(F.col("__c__") - 1).alias("clones"),
                    F.sum("__c__").alias("docs")).first())
        if not row or not row["docs"]:
            return (1, 0.0)
        return (int(row["wmax"]), float(row["clones"]) / float(row["docs"]))

    return memoize_plan_stat(df.select(F.col(text_col)), "__clones__", compute)


def should_collapse(df: DataFrame, text_col: str,
                    max_clone_width: int, clone_fraction: float) -> bool:
    """Trip on either flood shape: one degenerate group (width) or
    pervasive narrow duplication (fraction) — a corpus of 10x exact
    copies has width 10 but pays ~w^2 candidate work on EVERY doc,
    which rep-collapse cuts ~8x (measured, SCALING.md round 5)."""
    wmax, frac = corpus_clone_stats(df, text_col)
    return wmax > max_clone_width or frac > clone_fraction


def clear_probe_memo() -> None:
    """Drop every memoized probe result (e.g. after overwriting a table
    a memoized plan reads, or between unrelated test corpora)."""
    with _LOCK:
        _MEMO.clear()
