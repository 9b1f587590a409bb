"""Coder-registry mapping and opaque-object fallback tests."""

from __future__ import annotations

import datetime
import decimal
from typing import Dict, List, NamedTuple, Optional

from pyspark.sql import types as T

from apache_beam_spark.coders import OpaqueCoder, schema_for, spark_type_for


def test_primitive_mappings():
    assert spark_type_for(int) == T.LongType()
    assert spark_type_for(float) == T.DoubleType()
    assert spark_type_for(str) == T.StringType()
    assert spark_type_for(bytes) == T.BinaryType()
    assert spark_type_for(bool) == T.BooleanType()
    assert spark_type_for(datetime.datetime) == T.TimestampType()
    assert spark_type_for(decimal.Decimal) == T.DecimalType(38, 18)


def test_container_mappings():
    assert spark_type_for(List[int]) == T.ArrayType(T.LongType())
    assert spark_type_for(Dict[str, float]) == T.MapType(T.StringType(), T.DoubleType())
    assert spark_type_for(Optional[str]) == T.StringType()
    assert spark_type_for(List[List[str]]) == T.ArrayType(T.ArrayType(T.StringType()))


class KV(NamedTuple):
    key: str
    value: int


def test_namedtuple_schema():
    s = schema_for(KV)
    assert [f.name for f in s.fields] == ["key", "value"]
    assert s["key"].dataType == T.StringType()
    assert s["value"].dataType == T.LongType()
    # nested: a KV inside a container
    assert spark_type_for(List[KV]) == T.ArrayType(s)


def test_unknown_type_falls_back_to_binary():
    class Weird:
        pass

    assert spark_type_for(Weird) == T.BinaryType()


def test_opaque_roundtrip(spark):
    objs = [{"a": 1, "nested": [1, 2]}, {"a": 2, "nested": []}]
    df = OpaqueCoder.encode_objects(spark, objs)
    assert df.schema.simpleString() == "struct<id:bigint,blob:binary>"
    out = OpaqueCoder.decode_map(
        df, "blob", lambda o: {"a": o["a"], "n": len(o["nested"])},
        "id bigint, a bigint, n bigint")
    rows = {r["id"]: (r["a"], r["n"]) for r in out.collect()}
    assert rows == {0: (1, 2), 1: (2, 0)}


def test_opaque_grouping_key(spark):
    import pickle

    rows = [(1, pickle.dumps("same")), (2, pickle.dumps("same")),
            (3, pickle.dumps("other"))]
    df = spark.createDataFrame(rows, "id bigint, blob binary")
    n = df.groupBy(OpaqueCoder.key_col("blob").alias("k")).count().count()
    assert n == 2
