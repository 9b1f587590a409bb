"""Type system: the reference's Coder registry mapped onto Spark SQL
types.

Reference: every PCollection's element type is defined by a ``Coder``
(``coders/Coder.java:58`` encode/decode byte streams) picked by
``CoderRegistry`` (``coders/CoderRegistry.java``) — 43 built-in coders,
an opaque ``SerializableCoder`` fallback, and per-element serialization
at every boundary.

Spark inverts this: types are COLUMNS (Tungsten UnsafeRow / Arrow), and
serialization boundaries exist only at shuffles and the Python edge —
both handled natively.  What remains of the coder concept here:

* ``spark_type_for`` — the registry: infer a Spark SQL type from a
  Python type / type hint (the reference's coder inference,
  ``typehints/trivial_inference.py``);
* ``schema_for`` — row-class / dict / NamedTuple -> StructType;
* ``OpaqueCoder`` — the ``SerializableCoder`` fallback: pickle into ONE
  binary column for genuinely opaque user objects, with explicit
  encode/decode stages so the cost is visible in the plan (the
  reference paid it invisibly on every element).
"""

from __future__ import annotations

import datetime
import decimal
import pickle
import typing
from typing import Any, Iterator, Optional, get_args, get_origin

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: the reference's coder table (SURVEY.md §1.2), python-side
_PRIMITIVES: dict[type, T.DataType] = {
    int: T.LongType(),            # VarLong/BigEndianLong
    float: T.DoubleType(),        # DoubleCoder
    str: T.StringType(),          # StringUtf8Coder
    bool: T.BooleanType(),        # BooleanCoder
    bytes: T.BinaryType(),        # ByteArrayCoder
    bytearray: T.BinaryType(),
    datetime.datetime: T.TimestampType(),   # InstantCoder
    datetime.date: T.DateType(),
    datetime.timedelta: T.DayTimeIntervalType(),  # DurationCoder
    decimal.Decimal: T.DecimalType(38, 18),       # BigDecimalCoder
}


def spark_type_for(py_type: Any) -> T.DataType:
    """CoderRegistry.getCoder analog: python type (hint) -> Spark type.

    Handles primitives, Optional, list/set/tuple -> ArrayType,
    dict -> MapType, NamedTuple -> StructType; anything else falls back
    to BinaryType (the SerializableCoder path — wrap with OpaqueCoder).
    """
    if py_type in _PRIMITIVES:
        return _PRIMITIVES[py_type]
    origin = get_origin(py_type)
    if origin in (list, set, frozenset, tuple):
        args = [a for a in get_args(py_type) if a is not Ellipsis]
        elem = spark_type_for(args[0]) if args else T.BinaryType()
        return T.ArrayType(elem)
    if origin is dict:
        kt, vt = (get_args(py_type) + (Any, Any))[:2]
        return T.MapType(spark_type_for(kt), spark_type_for(vt))
    if origin is typing.Union:  # Optional[X] == Union[X, None]
        args = [a for a in get_args(py_type) if a is not type(None)]
        if len(args) == 1:
            return spark_type_for(args[0])
    if hasattr(py_type, "_fields") and hasattr(py_type, "__annotations__"):
        return schema_for(py_type)  # NamedTuple -> KV/row struct
    return T.BinaryType()  # SerializableCoder fallback


def schema_for(row_type: Any) -> T.StructType:
    """AvroCoder/POJO analog: NamedTuple or annotated class -> StructType."""
    hints = typing.get_type_hints(row_type)
    return T.StructType([
        T.StructField(name, spark_type_for(t), True) for name, t in hints.items()
    ])


class OpaqueCoder:
    """SerializableCoder fallback (``coders/SerializableCoder.java``):
    pickle arbitrary objects into one binary column.

    The slow path, by design made explicit: ``encode`` produces a
    DataFrame stage you can see in the plan; keep opaque payloads OUT of
    join/group keys (hash the bytes instead — ``key_col``)."""

    @staticmethod
    def encode_objects(spark, objects: list, id_offset: int = 0) -> DataFrame:
        rows = [(i + id_offset, pickle.dumps(o)) for i, o in enumerate(objects)]
        return spark.createDataFrame(rows, "id bigint, blob binary")

    @staticmethod
    def decode_map(df: DataFrame, blob_col: str, fn, output_schema: str) -> DataFrame:
        """Apply ``fn(obj) -> dict`` to each decoded object —
        Arrow-batched, the only place the pickle cost is paid."""
        cols = [c for c in df.columns if c != blob_col]

        def mapper(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                out = []
                for _, row in pdf.iterrows():
                    res = fn(pickle.loads(row[blob_col]))
                    res.update({c: row[c] for c in cols})
                    out.append(res)
                yield pd.DataFrame(out)

        return df.mapInPandas(mapper, output_schema)

    @staticmethod
    def key_col(blob_col: str) -> "F.Column":
        """Deterministic grouping key for opaque payloads (the
        reference's ``StructuralByteArray`` trick): hash of the bytes."""
        return F.sha2(F.col(blob_col), 256)
