#!/usr/bin/env python3
"""Benchmark the headline queries at $SPARK_GRAFT_SF_DIR (default sf0.1).

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Execution is forced with the noop sink (full computation, no driver-side
result transfer) so the numbers measure the engine, not toPandas.
"""

from __future__ import annotations

import json
import os
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

#: headline queries — the heavy, scale-relevant subset of queries()
HEADLINE = [
    "q1_pricing_summary",
    "star_join_revenue",
    "cogroup_by_key",
    "top_per_key",
    "window_fixed",
    "window_sliding",
    "window_session",
    "wordcount",
    "group_into_batches",
    "latest_per_user",
    "dedup_exact",
    "dedup_minhash",
    "dedup_simhash",
    "ngram_jaccard",
    "embed_knn",
    "embed_lsh_knn",
    "text_stats",
    "quality_score",
]


def main() -> None:
    from pyspark.sql import SparkSession

    from apache_beam_spark.engine import _ENGINE_CONF

    builder = SparkSession.builder.appName("bench").master(f"local[{CPUS}]")
    for k, v in _ENGINE_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()

    # warm the JVM + file listing with a trivial action
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.time()
        df = fn(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(json.dumps({
        "metric": "headline_suite_seconds",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
