"""Protobuf coder family (reference
``sdks/java/extensions/protobuf/.../ProtoCoder.java:93``).

The reference encodes PCollection elements with generated
``Message.writeTo``/``parseFrom``; its coder carries the message class
plus registered extensions.  Two Spark-side layers replace it:

* **JVM path** (the 100 TB path): ``from_protobuf_col`` /
  ``to_protobuf_col`` wrap ``pyspark.sql.protobuf.functions`` —
  Catalyst expressions, whole-stage codegen, descriptor-file driven.
  The ``spark-protobuf`` module is not bundled with the pip
  distribution, so the wrappers are gated and raise with the package
  coordinate (the ``sources/connectors.py`` pattern).
* **Python path** (always available, Arrow-batched): a minimal
  implementation of the public protobuf wire format
  (https://protobuf.dev/programming-guides/encoding/ — varint, zigzag,
  fixed32/64, length-delimited) driven by a ``ProtoSchema`` field
  table, the moral equivalent of a compiled descriptor.  Unknown
  fields are skipped on decode exactly as ``parseFrom`` does.  This is
  the testable in-sandbox story and doubles as the coder for Python
  DoFn pipelines whose elements are proto-shaped.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Any, Iterator, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# ---------------------------------------------------------------- wire format

_WT_VARINT, _WT_I64, _WT_LEN, _WT_I32 = 0, 1, 2, 5

#: scalar type -> (wire type, packer, unpacker); see encoding guide
_VARINT_TYPES = {"int32", "int64", "uint32", "uint64", "bool", "enum"}
_ZIGZAG_TYPES = {"sint32", "sint64"}
_FIXED = {"fixed64": ("<Q", _WT_I64), "sfixed64": ("<q", _WT_I64),
          "double": ("<d", _WT_I64), "fixed32": ("<I", _WT_I32),
          "sfixed32": ("<i", _WT_I32), "float": ("<f", _WT_I32)}
_LEN_TYPES = {"string", "bytes"}


def _write_varint(out: bytearray, v: int) -> None:
    if v < 0:  # negative int32/int64 -> 10-byte two's complement
        v += 1 << 64
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return


def _read_varint(buf: bytes, pos: int) -> tuple[int, int]:
    shift = result = 0
    while True:
        if pos >= len(buf):
            raise ValueError("truncated varint")
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7
        if shift >= 70:
            raise ValueError("malformed varint")


def _zigzag(v: int) -> int:
    return (v << 1) ^ (v >> 63)


def _unzigzag(v: int) -> int:
    return (v >> 1) ^ -(v & 1)


@dataclass(frozen=True)
class ProtoField:
    """One row of the descriptor table: ``optional int64 user_id = 2;``
    becomes ``ProtoField(2, "user_id", "int64")``."""

    number: int
    name: str
    type: str
    repeated: bool = False

    def __post_init__(self):
        if not (self.type in _VARINT_TYPES or self.type in _ZIGZAG_TYPES
                or self.type in _FIXED or self.type in _LEN_TYPES):
            raise ValueError(f"unsupported proto type: {self.type}")


@dataclass(frozen=True)
class ProtoSchema:
    """The compiled-descriptor analog ProtoCoder carries
    (ProtoCoder.java:138 getMessageType): field-number table for one
    message type."""

    fields: tuple[ProtoField, ...]

    def __init__(self, fields):
        object.__setattr__(self, "fields", tuple(fields))
        nums = [f.number for f in self.fields]
        if len(set(nums)) != len(nums):
            raise ValueError("duplicate field numbers")

    # -- element codec (the Coder.encode/decode contract) ------------------
    def encode(self, msg: dict[str, Any]) -> bytes:
        out = bytearray()
        for f in self.fields:
            vals = msg.get(f.name)
            if vals is None:
                continue  # proto3: absent/None field -> omitted
            for v in (vals if f.repeated else (vals,)):
                if v is None:
                    continue
                self._encode_one(out, f, v)
        return bytes(out)

    def _encode_one(self, out: bytearray, f: ProtoField, v: Any) -> None:
        if f.type in _VARINT_TYPES:
            _write_varint(out, (f.number << 3) | _WT_VARINT)
            _write_varint(out, int(v))
        elif f.type in _ZIGZAG_TYPES:
            _write_varint(out, (f.number << 3) | _WT_VARINT)
            _write_varint(out, _zigzag(int(v)))
        elif f.type in _FIXED:
            fmt, wt = _FIXED[f.type]
            _write_varint(out, (f.number << 3) | wt)
            out += struct.pack(fmt, v)
        else:  # length-delimited
            data = v.encode("utf-8") if f.type == "string" else bytes(v)
            _write_varint(out, (f.number << 3) | _WT_LEN)
            _write_varint(out, len(data))
            out += data

    def decode(self, data: bytes) -> dict[str, Any]:
        by_num = {f.number: f for f in self.fields}
        msg: dict[str, Any] = {
            f.name: [] if f.repeated else None for f in self.fields}
        pos = 0
        while pos < len(data):
            tag, pos = _read_varint(data, pos)
            num, wt = tag >> 3, tag & 7
            f = by_num.get(num)
            if wt == _WT_VARINT:
                raw, pos = _read_varint(data, pos)
                val: Any = raw
            elif wt == _WT_I64:
                raw_b, pos = data[pos:pos + 8], pos + 8
                val = raw_b
            elif wt == _WT_I32:
                raw_b, pos = data[pos:pos + 4], pos + 4
                val = raw_b
            elif wt == _WT_LEN:
                ln, pos = _read_varint(data, pos)
                if pos + ln > len(data):
                    raise ValueError("truncated length-delimited field")
                val, pos = data[pos:pos + ln], pos + ln
            else:
                raise ValueError(f"unsupported wire type {wt}")
            if f is None:
                continue  # unknown field: skip (parseFrom semantics)
            if (f.repeated and wt == _WT_LEN and f.type not in _LEN_TYPES):
                # packed repeated scalars — the proto3 DEFAULT encoding
                # for repeated numerics; parseFrom accepts packed and
                # unpacked interchangeably, so must we
                msg[f.name].extend(self._unpack_packed(f, val))
                continue
            val = self._coerce(f, wt, val)
            if f.repeated:
                msg[f.name].append(val)
            else:
                msg[f.name] = val
        return msg

    def _unpack_packed(self, f: ProtoField, payload: bytes) -> list:
        """Unpack a packed repeated scalar payload: back-to-back
        varints, or fixed-size chunks for fixed32/64 kinds."""
        out: list = []
        if f.type in _FIXED:
            fmt, exp_wt = _FIXED[f.type]
            size = struct.calcsize(fmt)
            if len(payload) % size:
                raise ValueError(f"truncated packed field {f.name}")
            for i in range(0, len(payload), size):
                out.append(self._coerce(f, exp_wt, payload[i:i + size]))
        else:  # varint / zigzag kinds
            pos = 0
            while pos < len(payload):
                raw, pos = _read_varint(payload, pos)
                out.append(self._coerce(f, _WT_VARINT, raw))
        return out

    def _coerce(self, f: ProtoField, wt: int, val: Any) -> Any:
        # wire-type validation for EVERY kind — a field arriving with
        # the wrong wire type is malformed input and must raise the
        # clean parse error, not a duck-typing crash (fuzz-found)
        if f.type in _VARINT_TYPES or f.type in _ZIGZAG_TYPES:
            if wt != _WT_VARINT:
                raise ValueError(f"wire type mismatch for {f.name}")
            if f.type in _ZIGZAG_TYPES:
                return _unzigzag(val)
            if f.type == "bool":
                return bool(val)
            if f.type in ("int32", "int64") and val >= 1 << 63:
                return val - (1 << 64)  # two's complement
            return val
        if f.type in _FIXED:
            fmt, exp_wt = _FIXED[f.type]
            if wt != exp_wt or len(val) != struct.calcsize(fmt):
                raise ValueError(f"wire type mismatch for {f.name}")
            return struct.unpack(fmt, val)[0]
        if wt != _WT_LEN:
            raise ValueError(f"wire type mismatch for {f.name}")
        if f.type == "string":
            try:
                return val.decode("utf-8")
            except UnicodeDecodeError as e:
                raise ValueError(f"invalid UTF-8 in {f.name}") from e
        return bytes(val)

    # -- Spark-side types --------------------------------------------------
    _SPARK = {"int32": "int", "sint32": "int", "sfixed32": "int",
              "uint32": "long", "fixed32": "long", "enum": "int",
              "int64": "long", "sint64": "long", "sfixed64": "long",
              "uint64": "long", "fixed64": "long",
              "bool": "boolean", "double": "double", "float": "float",
              "string": "string", "bytes": "binary"}

    def spark_schema(self) -> str:
        parts = []
        for f in self.fields:
            t = self._SPARK[f.type]
            parts.append(f"{f.name} {'array<%s>' % t if f.repeated else t}")
        return ", ".join(parts)


# ------------------------------------------------------------ column wrappers

def proto_encode(df: DataFrame, schema: ProtoSchema,
                 out_col: str = "proto",
                 keep: Optional[list[str]] = None) -> DataFrame:
    """Encode each row's schema fields into one binary column —
    Arrow-batched Pandas UDF (the codec is inherently per-element
    Python; the batch transfer is the fast path available for it)."""
    keep = df.columns if keep is None else keep
    names = [f.name for f in schema.fields]

    @F.pandas_udf("binary")
    def enc(*cols: pd.Series) -> pd.Series:
        rows = zip(*cols)
        return pd.Series(
            [schema.encode(dict(zip(names, r))) for r in rows])

    out = df.withColumn(out_col, enc(*[F.col(n) for n in names]))
    return out.select(*keep, out_col)


def proto_decode(df: DataFrame, schema: ProtoSchema,
                 binary_col: str = "proto",
                 prefix: str = "") -> DataFrame:
    """Decode a binary column through the schema into typed columns
    (ProtoCoder.decode).  Unknown fields in the payload are skipped."""
    names = [f.name for f in schema.fields]
    spark_t = f"struct<{schema.spark_schema()}>"

    @F.pandas_udf(spark_t)
    def dec(s: pd.Series) -> pd.DataFrame:
        decoded = [schema.decode(bytes(b)) for b in s]
        return pd.DataFrame(decoded, columns=names)

    tmp = "__proto_struct__"
    out = df.withColumn(tmp, dec(F.col(binary_col)))
    for n in names:
        out = out.withColumn(prefix + n, F.col(f"{tmp}.{n}"))
    return out.drop(tmp)


# ---------------------------------------------------------------- JVM path

_PROTO_PKG = "org.apache.spark:spark-protobuf_2.13"


def from_protobuf_col(data: Column, message_name: str,
                      desc_file_path: Optional[str] = None,
                      options: Optional[dict] = None) -> Column:
    """Catalyst-native decode via the spark-protobuf module (the scale
    path: codegen, no Python boundary).  Gated: the module is not in
    this container."""
    try:
        from pyspark.sql.protobuf.functions import from_protobuf

        return from_protobuf(data, message_name, desc_file_path,
                             options=options)
    except Exception as e:  # pragma: no cover - jar not in container
        raise NotImplementedError(
            f"from_protobuf requires {_PROTO_PKG} on the classpath; "
            "use proto_decode (Python wire-format path) meanwhile") from e


def to_protobuf_col(data: Column, message_name: str,
                    desc_file_path: Optional[str] = None,
                    options: Optional[dict] = None) -> Column:
    try:
        from pyspark.sql.protobuf.functions import to_protobuf

        return to_protobuf(data, message_name, desc_file_path,
                           options=options)
    except Exception as e:  # pragma: no cover - jar not in container
        raise NotImplementedError(
            f"to_protobuf requires {_PROTO_PKG} on the classpath; "
            "use proto_encode (Python wire-format path) meanwhile") from e
