"""User metrics (reference ``sdk/metrics/Metrics.java``: counter:63,
distribution:77, gauge:92; queried via ``MetricResults``).

Two Spark mechanisms cover the reference surface:

* **Plan-level metrics** — ``pyspark.sql.Observation`` / ``df.observe``:
  named aggregates evaluated DURING the action with no extra pass (the
  reference's attempted-metrics model; exactly-once per action).
* **UDF-level metrics** — SparkContext accumulators, for counts inside
  Python DoFn code (pandas UDFs / mapInPandas), mirroring
  ``Metrics.counter`` called from ``@ProcessElement``.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.sql import functions as F


class MetricResults:
    """Handle returned by ``observe_metrics``; ``get()`` blocks until
    the observed action completes (reference MetricResults.query)."""

    def __init__(self, observation: Observation):
        self._obs = observation

    def get(self) -> dict:
        return self._obs.get


def observe_metrics(df: DataFrame, name: str, *metrics: Column) -> tuple[DataFrame, MetricResults]:
    """Attach named metric aggregates to a plan point.

    ``metrics`` default: element count (the reference's implicit
    elements-processed counter)."""
    obs = Observation(name)
    cols = metrics or (F.count(F.lit(1)).alias("count"),)
    return df.observe(obs, *cols), MetricResults(obs)


def distribution(col: str | Column, prefix: str = "") -> list[Column]:
    """reference Metrics.distribution (min/max/sum/count/mean in one
    accumulator) as observe-able aggregates."""
    c = F.col(col) if isinstance(col, str) else col
    p = f"{prefix}_" if prefix else ""
    return [F.min(c).alias(f"{p}min"), F.max(c).alias(f"{p}max"),
            F.sum(c).alias(f"{p}sum"), F.count(c).alias(f"{p}count")]


class Counter:
    """reference Metrics.counter for Python-UDF code paths: a named
    SparkContext accumulator usable inside mapInPandas/pandas UDFs."""

    def __init__(self, spark: SparkSession, namespace: str, name: str):
        self.namespace, self.name = namespace, name
        self._acc = spark.sparkContext.accumulator(0)

    def inc(self, n: int = 1) -> None:
        self._acc.add(n)

    @property
    def value(self) -> int:
        return self._acc.value
