"""Driver test-table loaders (TESTDATA.md)."""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import LongType

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

#: (applicationId, sf_dir, name) -> DataFrame.  A DataFrame is an
#: immutable plan, so handing the same object to every caller is safe —
#: and each ``spark.read.parquet`` costs a driver-side footer/schema
#: read plus py4j chatter that the bench pays once per query build
#: (optimization r13: ~20 passthrough queries each re-read all 10
#: schemas via register_views).  Keyed by applicationId so a restarted
#: context never sees another context's plans.
_TABLE_MEMO: dict[tuple[str, str, str], DataFrame] = {}

#: applicationId -> sf_dir whose temp views are CURRENTLY registered
#: (a dict, not a set: switching dirs must re-register, and switching
#: back must re-register again — the views are session-global names)
_VIEWS_DONE: dict[str, str] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str = DEFAULT_SF_DIR) -> DataFrame:
    """Read one test table (memoized per session+dir — see _TABLE_MEMO).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark's vectorized
    reader refuses (PARQUET_TYPE_ILLEGAL).  We read nanos as long
    (legacy conf) and truncate to microseconds — the same floor-division
    DuckDB applies, so oracle comparisons agree to the microsecond.
    """
    key = (spark.sparkContext.applicationId, sf_dir, name)
    df = _TABLE_MEMO.get(key)
    if df is not None:
        return df
    if name == "events":
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
        if isinstance(df.schema["ts"].dataType, LongType):
            # integer division: float division would lose precision (ns
            # epoch values exceed double's 53-bit exact-integer range)
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    else:
        df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    _TABLE_MEMO[key] = df
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {t: load_table(spark, t, sf_dir) for t in TABLES}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every test table as a temp view for spark.sql use.

    Idempotent per (session, dir): re-registering the same ten views
    for every passthrough query build cost ten createOrReplaceTempView
    round trips each — the views survive for the session's lifetime."""
    app = spark.sparkContext.applicationId
    if _VIEWS_DONE.get(app) == sf_dir:
        return
    for t in TABLES:
        load_table(spark, t, sf_dir).createOrReplaceTempView(t)
    _VIEWS_DONE[app] = sf_dir
