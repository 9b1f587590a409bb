"""apache_beam_spark — a PySpark-native analytics engine.

A brand-new engine with the query/data-processing capabilities of the
reference (an Apache Beam 2.2.0-SNAPSHOT fork: unified batch + streaming
dataflow model), re-expressed Spark-first:

- ``Pipeline`` / ``PCollection`` wrap a ``SparkSession`` / ``DataFrame``
  (reference: ``sdks/java/core/.../Pipeline.java``,
  ``values/PCollection.java``).  Every operator lowers immediately to
  DataFrame/Column expressions so Catalyst/Tungsten provide predicate
  pushdown, column pruning, whole-stage codegen, partial aggregation and
  AQE — none of which the row-oriented reference had.
- Windowing semantics (fixed/sliding/session/calendar/global windows,
  watermarks, allowed lateness) map onto ``window()`` /
  ``session_window()`` / ``withWatermark()`` (reference:
  ``transforms/windowing/``).
- Streaming uses Structured Streaming; stateful ParDo maps to
  ``applyInPandasWithState`` (reference: ``state/StateSpecs.java``).
- Beyond parity: large-scale training-data pipeline operators (exact +
  fuzzy dedup, ANN similarity search, multimodal binary columns, text
  analysis) built on the same core.
"""

from apache_beam_spark.engine import get_spark, stop_spark
from apache_beam_spark.pipeline import PCollection, Pipeline, PTransform
from apache_beam_spark.windowing import (
    CalendarWindows,
    FixedWindows,
    GlobalWindows,
    Sessions,
    SlidingWindows,
    WindowingStrategy,
)

__all__ = [
    "Pipeline",
    "PCollection",
    "PTransform",
    "get_spark",
    "stop_spark",
    "WindowingStrategy",
    "FixedWindows",
    "SlidingWindows",
    "Sessions",
    "CalendarWindows",
    "GlobalWindows",
]

__version__ = "0.1.0"
