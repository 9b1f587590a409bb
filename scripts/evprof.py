"""Event-log job/stage attribution for one warm query run.

Usage: python scripts/evprof.py <query> [query ...]

Runs each named query cold then warm (scoped caches shared, like the
bench suite), with the warm run under its own job group and event
logging on; then prints, per warm run, every job with duration, stage
task counts/durations and the driver-side gap before it — the profile
that says whether a query's wall is stages, Python tasks, or driver
planning.
"""

from __future__ import annotations

import glob
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, "/root/repo")

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
EVDIR = "/tmp/spark-events"


def main() -> None:
    names = sys.argv[1:]
    os.makedirs(EVDIR, exist_ok=True)
    from pyspark.sql import SparkSession

    from apache_beam_spark.engine import _ENGINE_CONF

    builder = (SparkSession.builder.appName("evprof")
               .master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
               .config("spark.eventLog.enabled", "true")
               .config("spark.eventLog.dir", EVDIR))
    for k, v in _ENGINE_CONF.items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod

    queries = entrymod.queries()
    spark.read.parquet(f"{SF_DIR}/region.parquet").count()
    appid = spark.sparkContext.applicationId

    from apache_beam_spark.plans.caching import scoped_caches

    walls = {}
    with scoped_caches():
        for name in names:
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            spark.sparkContext.setJobGroup(f"warm-{name}", name)
            t0 = time.time()
            df = queries[name](spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            walls[name] = time.time() - t0
            spark.sparkContext.setJobGroup(None, None)
    spark.stop()

    evfile = glob.glob(f"{EVDIR}/eventlog_v2_{appid}/events_*")[0]
    raw = subprocess.run(["zstd", "-d", "-c", evfile], capture_output=True)
    jobs, stages = {}, {}
    for line in raw.stdout.decode().splitlines():
        ev = json.loads(line)
        t = ev.get("Event")
        if t == "SparkListenerJobStart":
            props = ev.get("Properties", {})
            grp = props.get("spark.jobGroup.id", "")
            if not grp.startswith("warm-"):
                continue
            jobs[ev["Job ID"]] = {
                "q": grp[5:], "start": ev["Submission Time"],
                "sids": ev["Stage IDs"],
                "callsite": props.get("callSite.short", "")}
        elif t == "SparkListenerJobEnd":
            if ev["Job ID"] in jobs:
                jobs[ev["Job ID"]]["dur"] = (
                    ev["Completion Time"] - jobs[ev["Job ID"]]["start"]) / 1e3
        elif t == "SparkListenerStageCompleted":
            si = ev["Stage Info"]
            stages[si["Stage ID"]] = (
                si["Stage Name"].split(":")[0], si["Number of Tasks"],
                (si.get("Completion Time", 0) -
                 si.get("Submission Time", 0)) / 1e3)

    cur, prev_end = None, None
    for jid in sorted(jobs):
        j = jobs[jid]
        if j["q"] != cur:
            cur, prev_end = j["q"], None
            print(f"\n== {cur} (warm wall {walls.get(cur, 0):.2f}s) ==")
        gap = (j["start"] - prev_end) / 1e3 if prev_end else 0.0
        prev_end = j["start"] + j.get("dur", 0) * 1e3
        sdesc = " ".join(
            f"{stages[s][0]}x{stages[s][1]}({stages[s][2]:.2f}s)"
            for s in j["sids"] if s in stages)
        print(f"J{jid} {j.get('dur', 0):6.2f}s gap={gap:5.2f}s "
              f"{j['callsite'][:30]:30s} | {sdesc[:90]}")


if __name__ == "__main__":
    main()
