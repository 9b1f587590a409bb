"""TFRecordIO (reference ``io/TFRecordIO.java``, 690 LoC).

TFRecord framing (public TensorFlow format):
    [length  uint64 LE] [masked_crc32c(length) uint32 LE]
    [data    bytes    ] [masked_crc32c(data)   uint32 LE]

Read path: ``binaryFile`` source (one whole file per row — TFRecord has
no sync markers, so files aren't splittable; the reference reads them
sequentially per file too) → Arrow-batched parse to one ``record``
binary column.  Parallelism at 100 TB comes from file count, which is
how TFRecord datasets ship (many ~100 MB shards).

Write path: shard to ``num_shards`` partitions and write one
``part-NNNNN.tfrecord`` per partition from the executors —
``foreachPartition`` is the supported imperative sink here because
Spark has no binary-stream file format (SURVEY.md §2.1 ParDo mapping,
"mapPartitions as a last resort").
"""

from __future__ import annotations

import os
import struct
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, SparkSession

# -- crc32c (Castagnoli), table-driven; public algorithm -----------------
_CRC_TABLE = []


def _crc_table() -> list[int]:
    global _CRC_TABLE
    if not _CRC_TABLE:
        poly = 0x82F63B78
        tbl = []
        for n in range(256):
            c = n
            for _ in range(8):
                c = (c >> 1) ^ poly if c & 1 else c >> 1
            tbl.append(c)
        _CRC_TABLE = tbl
    return _CRC_TABLE


def _crc32c(data: bytes) -> int:
    tbl = _crc_table()
    crc = 0xFFFFFFFF
    for b in data:
        crc = tbl[(crc ^ b) & 0xFF] ^ (crc >> 8)
    return crc ^ 0xFFFFFFFF


def _masked_crc(data: bytes) -> int:
    crc = _crc32c(data)
    return ((((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF)


def _frame_record(data: bytes) -> bytes:
    """length(u64le) + masked_crc(length) + data + masked_crc(data)."""
    header = struct.pack("<Q", len(data))
    return (header + struct.pack("<I", _masked_crc(header))
            + data + struct.pack("<I", _masked_crc(data)))


def _parse_tfrecords(blob: bytes, verify_crc: bool) -> list[bytes]:
    out, off, n = [], 0, len(blob)
    while off + 12 <= n:
        (length,) = struct.unpack_from("<Q", blob, off)
        (len_crc,) = struct.unpack_from("<I", blob, off + 8)
        if verify_crc and _masked_crc(blob[off:off + 8]) != len_crc:
            raise ValueError(f"corrupt TFRecord length crc at offset {off}")
        start = off + 12
        if start + length + 4 > n:
            raise ValueError(
                f"truncated TFRecord at offset {off}: record needs "
                f"{start + length + 4 - off} bytes, only {n - off} remain")
        data = blob[start:start + length]
        (data_crc,) = struct.unpack_from("<I", blob, start + length)
        if verify_crc and _masked_crc(data) != data_crc:
            raise ValueError(f"corrupt TFRecord data crc at offset {start}")
        out.append(data)
        off = start + length + 4
    if off != n:
        # reference TFRecordIO fails on truncation rather than dropping tail
        raise ValueError(
            f"truncated TFRecord file: {n - off} trailing bytes at offset {off} "
            "are not a complete record header")
    return out


def read_tfrecord(spark: SparkSession, path: str, verify_crc: bool = True) -> DataFrame:
    """-> DataFrame(path string, record binary) — one row per TFRecord."""
    files = spark.read.format("binaryFile").load(path) \
        .select("path", "content")

    def fn(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            paths, recs = [], []
            for p, content in zip(pdf["path"], pdf["content"]):
                for r in _parse_tfrecords(bytes(content), verify_crc):
                    paths.append(p); recs.append(r)
            yield pd.DataFrame({"path": paths, "record": recs})

    return files.mapInPandas(fn, "path string, record binary")


def write_tfrecord(df: DataFrame, record_col: str, path: str,
                   num_shards: Optional[int] = None) -> None:
    """Sharded TFRecord write (reference withNumShards -> repartition)."""
    os.makedirs(path, exist_ok=True)
    data = df.select(record_col)
    if num_shards:
        data = data.repartition(num_shards)

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        out = os.path.join(path, f"part-{pid:05d}.tfrecord")
        tmp = out + ".tmp"
        wrote = False
        with open(tmp, "wb") as f:
            for row in rows:
                f.write(_frame_record(bytes(row[0])))
                wrote = True
        # commit-by-rename; empty partitions leave no file
        if wrote:
            os.replace(tmp, out)
        else:
            os.remove(tmp)

    data.foreachPartition(write_partition)
