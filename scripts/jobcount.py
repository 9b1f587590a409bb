"""Count Spark jobs/stages/tasks per query via the status tracker.

Usage: python scripts/jobcount.py <query> [query ...]

Runs each named ``queries()`` entry twice (cold-in-scope, then warm)
inside one scoped_caches() region under a job group, and prints how
many jobs, stages and tasks each run launched — the structural
fixed-overhead profile that dominates wall time at bench scale and
multiplies into real cost at 100 TB (guide §1.2: count the passes).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def main() -> None:
    names = sys.argv[1:]
    from apache_beam_spark.engine import get_spark

    spark = get_spark("jobcount")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()

    from apache_beam_spark.plans.caching import scoped_caches

    tracker = sc.statusTracker()

    def profile(name: str, tag: str) -> dict:
        group = f"{name}-{tag}"
        sc.setJobGroup(group, name)
        t0 = time.time()
        df = queries[name](spark, SF_DIR)
        t1 = time.time()
        df.write.format("noop").mode("overwrite").save()
        t2 = time.time()
        sc.setJobGroup(None, None)
        jids = sorted(tracker.getJobIdsForGroup(group))
        n_stages = n_tasks = 0
        for j in jids:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for s in ji.stageIds:
                si = tracker.getStageInfo(s)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        return {"jobs": len(jids), "stages": n_stages, "tasks": n_tasks,
                "construct_s": round(t1 - t0, 2), "noop_s": round(t2 - t1, 2)}

    out = {}
    with scoped_caches():
        for name in names:
            cold = profile(name, "cold")
            warm = profile(name, "warm")
            out[name] = {"cold": cold, "warm": warm}
            print(f"# {name}: cold {cold} | warm {warm}", file=sys.stderr,
                  flush=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
