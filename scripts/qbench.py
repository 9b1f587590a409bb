"""Scoped per-query bench for optimization A/B runs.

Usage: python scripts/qbench.py [-n N] <query> [query ...]

Mirrors bench.py's methodology exactly — noop sink, min-of-N walls
inside one scoped_caches() region, SF dir / CPUs from the same env
vars — but over a named subset, so an optimization can be timed
without a 3-4 minute full-suite run.  Prints one JSON line with the
per-query min walls, the per-query first (cache-building) walls, and
the lineitem fixed-work canary sampled before and after each query
block (the canary is how runs on this noisy host are made comparable:
divide walls by the run's median canary).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")


def main() -> None:
    args = sys.argv[1:]
    n = 3
    if args and args[0] == "-n":
        n = int(args[1])
        args = args[2:]
    names = args
    from pyspark.sql import SparkSession, functions as F

    from apache_beam_spark.engine import _ENGINE_CONF

    builder = SparkSession.builder.appName("qbench").master(f"local[{CPUS}]")
    for k, v in _ENGINE_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    def canary() -> float:
        t0 = time.time()
        li.groupBy("l_returnflag", "l_linestatus").agg(
            F.sum("l_quantity"), F.avg("l_extendedprice"),
            F.count("*")).collect()
        return round(time.time() - t0, 3)

    from apache_beam_spark.plans.caching import scoped_caches

    mins: dict[str, float] = {}
    firsts: dict[str, float] = {}
    series: dict[str, list[float]] = {}
    canaries: list[float] = [canary()]
    with scoped_caches():
        for name in names:
            spark.sparkContext.setJobDescription(f"qbench:{name}")
            walls = []
            for _ in range(n):
                t0 = time.time()
                df = queries[name](spark, SF_DIR)
                df.write.format("noop").mode("overwrite").save()
                walls.append(round(time.time() - t0, 3))
            spark.sparkContext.setJobDescription(None)
            firsts[name] = walls[0]
            mins[name] = min(walls)
            series[name] = walls
            canaries.append(canary())
            print(f"# {name}: min={mins[name]:.3f} walls={walls} "
                  f"canary={canaries[-1]:.3f}", file=sys.stderr)
    out = {"sf_dir": SF_DIR, "n": n, "mins": mins, "firsts": firsts,
           "series": series, "canaries": canaries,
           "canary_med": sorted(canaries)[len(canaries) // 2]}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
