"""HadoopInputFormatIO parity (reference
``sdks/java/io/hadoop/input-format/.../HadoopInputFormatIO.java:180``).

The reference's generic escape hatch: read through ANY Hadoop
``InputFormat`` given a Configuration naming the format/key/value
classes (``mapreduce.job.inputformat.class`` /
``mapreduce.job.output.{key,value}.class``), with optional
key/value translation functions into Beam-codable types.

Spark is itself Hadoop-native, so the mapping is direct:
``sparkContext.newAPIHadoopRDD`` takes the same three class names and
the same Configuration dict, Spark's Pyrolite converters replace the
WritableCoder machinery, and the translation functions become plain
row mapping into a DataFrame.  Splitting (``getSplits``) and locality
are owned by the Hadoop format exactly as in the reference's
``HadoopInputFormatBoundedSource.splitIntoBundles``; no driver-side
materialization happens — the RDD-to-DataFrame conversion is lazy and
distributed.
"""

from __future__ import annotations

from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession

#: Configuration keys the reference requires (HadoopInputFormatIO.java:
#: 228-258 validateConfiguration)
INPUTFORMAT_CLASS_ATTR = "mapreduce.job.inputformat.class"
KEY_CLASS = "key.class"
VALUE_CLASS = "value.class"


def read_hadoop_input_format(
    spark: SparkSession,
    conf: dict[str, str],
    key_translation: Optional[Callable] = None,
    value_translation: Optional[Callable] = None,
    schema: Optional[str] = None,
    key_converter: Optional[str] = None,
    value_converter: Optional[str] = None,
) -> DataFrame:
    """HadoopInputFormatIO.read().withConfiguration(conf)
    [.withKeyTranslation(...)][.withValueTranslation(...)].

    ``conf`` must name ``mapreduce.job.inputformat.class``,
    ``key.class`` and ``value.class`` (the same validation the
    reference performs in Read.withConfiguration); every other entry is
    passed to the format verbatim (paths, ranges, credentials...).

    Returns a DataFrame with columns ``(key, value)`` — or the
    ``schema`` you give, applied after the optional translations (the
    withKeyTranslation/withValueTranslation analogs; they run in one
    distributed map, not on the driver).
    """
    missing = [k for k in (INPUTFORMAT_CLASS_ATTR, KEY_CLASS, VALUE_CLASS)
               if k not in conf]
    if missing:
        raise ValueError(
            f"Configuration must specify {missing} "
            "(HadoopInputFormatIO.Read.withConfiguration contract)")
    fmt = conf[INPUTFORMAT_CLASS_ATTR]
    kcls, vcls = conf[KEY_CLASS], conf[VALUE_CLASS]
    extra = {k: v for k, v in conf.items()
             if k not in (INPUTFORMAT_CLASS_ATTR, KEY_CLASS, VALUE_CLASS)}
    rdd = spark.sparkContext.newAPIHadoopRDD(
        fmt, kcls, vcls, conf=extra,
        keyConverter=key_converter, valueConverter=value_converter)
    if key_translation or value_translation:
        kt = key_translation or (lambda k: k)
        vt = value_translation or (lambda v: v)
        rdd = rdd.map(lambda kv: (kt(kv[0]), vt(kv[1])))
    return spark.createDataFrame(rdd, schema=schema or "key string, value string")


def read_sequence_file(spark: SparkSession, path: str,
                       schema: Optional[str] = None,
                       min_splits: Optional[int] = None) -> DataFrame:
    """The most common HadoopInputFormatIO deployment in the reference
    examples: SequenceFile of Writables.  ``sequenceFile`` resolves the
    key/value classes from the file header, so no Configuration is
    needed."""
    rdd = spark.sparkContext.sequenceFile(
        path, minSplits=min_splits)
    return spark.createDataFrame(rdd, schema=schema or "key string, value string")


def write_sequence_file(df: DataFrame, path: str,
                        key_col: str = "key", value_col: str = "value") -> None:
    """Write-side helper (the reference pairs HadoopInputFormatIO with
    HDFS sinks): two-column DataFrame -> SequenceFile via
    ``saveAsNewAPIHadoopFile``; Pyrolite maps str->Text, int->
    LongWritable symmetrically with the read path."""
    (df.select(key_col, value_col).rdd
       .map(tuple)
       .saveAsNewAPIHadoopFile(
           path,
           "org.apache.hadoop.mapreduce.lib.output.SequenceFileOutputFormat",
           keyClass="org.apache.hadoop.io.Text",
           valueClass="org.apache.hadoop.io.Text"))
