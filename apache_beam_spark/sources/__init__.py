"""Sources / sinks.

Reference IO inventory (SURVEY.md §2.11): TextIO/AvroIO/TFRecordIO/
XmlIO file IO (``sdks/java/core/.../io/``), plus connector IO (Kafka,
JDBC, ...).  Spark-first: every bounded file format is a native
``spark.read`` (splitting, predicate pushdown and column pruning come
free — the reference's ``FileBasedSource`` offset-splitting machinery is
subsumed by Spark's file partitioning); streaming sources are
``spark.readStream``.
"""

from apache_beam_spark.sources.tables import TABLES, load_table, load_tables, register_views
from apache_beam_spark.sources.io import (
    GenerateSequence,
    match_files,
    read_avro,
    read_csv,
    read_jdbc,
    read_json,
    read_matches,
    read_orc,
    read_parquet,
    read_text,
    write_jdbc,
)
from apache_beam_spark.sources.catalog import (
    drop_table,
    read_table,
    table_exists,
    write_table,
)
from apache_beam_spark.sources.tfrecord import read_tfrecord, write_tfrecord

__all__ = [
    "TABLES", "load_table", "load_tables", "register_views",
    "read_parquet", "read_text", "read_json", "read_csv", "read_avro",
    "read_orc", "read_jdbc", "write_jdbc", "GenerateSequence",
    "read_table", "write_table", "table_exists", "drop_table",
    "match_files", "read_matches",
    "read_tfrecord", "write_tfrecord",
]
