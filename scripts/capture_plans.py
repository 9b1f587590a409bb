"""Capture .explain('formatted') output for named queries.

Usage: python scripts/capture_plans.py <out_dir> <suffix> [query ...]

Writes <out_dir>/<query>_<suffix>.txt for each query (default: the
optimization round's watch list).  Queries whose construction runs
driver-side actions (CC loops, fixed-codebook collects) execute those
actions during capture — that is inherent to their build, not a bug.
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

DEFAULT = [
    "semantic_dedup", "dup_clusters", "llm_corpus_prep", "dedup_simhash",
    "ngram_jaccard", "embed_near_dup", "ngram_containment", "dsir_scores",
    "dedup_incremental_minhash", "q18_large_volume", "dup_span_scrub",
    "chunk_dedup", "textrank_words", "dedup_incremental_bloom",
    "cms_word_counts", "image_near_dup", "quality_percentile",
    "star_join_revenue", "trigram_logprob", "q21_waiting_suppliers",
    "dedup_minhash", "q1_pricing_summary", "fuzzy_join_customers",
    "heavy_hitter_words", "kmv_user_overlap",
]


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "plans/r13"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    names = sys.argv[3:] or DEFAULT
    os.makedirs(out_dir, exist_ok=True)

    from apache_beam_spark.engine import get_spark
    import __spark_entry__ as entrymod

    spark = get_spark("capture-plans")
    spark.sparkContext.setLogLevel("ERROR")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    queries = entrymod.queries()

    from apache_beam_spark.plans.caching import scoped_caches

    with scoped_caches():
        for name in names:
            df = queries[name](spark, sf_dir)
            buf = io.StringIO()
            with redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(out_dir, f"{name}_{suffix}.txt")
            with open(path, "w") as f:
                f.write(buf.getvalue())
            txt = buf.getvalue()
            print(f"{name}: {txt.count('Exchange')} Exchange-mentions, "
                  f"{txt.count('BatchEvalPython')} BatchEvalPython, "
                  f"{txt.count('ArrowEvalPython')} ArrowEvalPython, "
                  f"{txt.count('MapInPandas')} MapInPandas -> {path}")
    spark.stop()


if __name__ == "__main__":
    main()
