"""IO connector tests: TFRecord round-trip (framing + masked crc32c),
XML read/write, text/json/csv basics."""

from __future__ import annotations

import glob
import os

from pyspark.sql import functions as F

from apache_beam_spark.sources.io import read_xml, write_xml
from apache_beam_spark.sources.tfrecord import (
    _masked_crc,
    read_tfrecord,
    write_tfrecord,
)


def test_masked_crc_known_vector():
    # crc32c("123456789") = 0xE3069283 (public test vector); masking is
    # rot15 + 0xa282ead8
    crc = 0xE3069283
    expect = (((crc >> 15) | (crc << 17)) + 0xA282EAD8) & 0xFFFFFFFF
    assert _masked_crc(b"123456789") == expect


def test_tfrecord_roundtrip(spark, tmp_path):
    out = str(tmp_path / "tfr")
    df = spark.range(0, 500).select(
        F.encode(F.concat(F.lit("rec-"), F.col("id").cast("string")), "utf-8")
        .alias("record"))
    write_tfrecord(df, "record", out, num_shards=4)
    files = glob.glob(os.path.join(out, "part-*.tfrecord"))
    assert 1 <= len(files) <= 4

    back = read_tfrecord(spark, out, verify_crc=True)
    recs = sorted(bytes(r["record"]).decode() for r in back.collect())
    assert len(recs) == 500
    assert recs[0] == "rec-0" and "rec-499" in recs


def test_tfrecord_corruption_detected(spark, tmp_path):
    out = str(tmp_path / "tfr2")
    df = spark.range(0, 10).select(
        F.encode(F.col("id").cast("string"), "utf-8").alias("record"))
    write_tfrecord(df, "record", out, num_shards=1)
    (path,) = glob.glob(os.path.join(out, "part-*.tfrecord"))
    blob = bytearray(open(path, "rb").read())
    blob[14] ^= 0xFF  # flip a data byte
    open(path, "wb").write(bytes(blob))
    try:
        read_tfrecord(spark, out, verify_crc=True).collect()
        assert False, "corruption not detected"
    except Exception as e:
        assert "crc" in str(e).lower()


def test_xml_roundtrip(spark, tmp_path):
    out = str(tmp_path / "xml")
    df = spark.createDataFrame([(1, "x"), (2, "y")], ["a", "b"])
    write_xml(df, out, row_tag="item", root_tag="items")
    back = read_xml(spark, out, row_tag="item")
    rows = sorted((r["a"], r["b"]) for r in back.collect())
    assert rows == [(1, "x"), (2, "y")]

def test_tfrecord_truncation_detected():
    """ADVICE regression: a truncated file must raise, not silently drop
    tail records (reference TFRecordIO fails on truncation)."""
    import pytest

    from apache_beam_spark.sources.tfrecord import _frame_record, _parse_tfrecords

    blob = _frame_record(b"hello") + _frame_record(b"world")
    assert _parse_tfrecords(blob, True) == [b"hello", b"world"]
    with pytest.raises(ValueError, match="truncated"):
        _parse_tfrecords(blob[:-3], True)   # torn mid-record
    with pytest.raises(ValueError, match="truncated"):
        _parse_tfrecords(blob + b"\x01\x02", True)  # trailing garbage header


def test_match_files_and_read_matches(spark, tmp_path):
    from apache_beam_spark.sources.io import match_files, read_matches

    for i in range(3):
        spark.range(10).write.mode("overwrite").parquet(
            str(tmp_path / f"t{i}.parquet"))
    m = match_files(spark, str(tmp_path / "t*.parquet"))
    rows = m.collect()
    assert len(rows) == 3
    assert all(r.size_bytes > 0 and r.mtime_ms > 0 for r in rows)
    assert read_matches(spark, m).count() == 30


def test_match_files_no_hits_is_empty(spark, tmp_path):
    from apache_beam_spark.sources.io import match_files

    assert match_files(spark, str(tmp_path / "nope*")).count() == 0


def test_schema_evolution_merge(spark, tmp_path):
    from apache_beam_spark.sources.io import read_parquet_evolving

    p = str(tmp_path / "evolve")
    spark.createDataFrame([(1, "a")], "id long, name string") \
        .write.mode("append").parquet(p)
    spark.createDataFrame([(2, "b", 9.5)],
                          "id long, name string, score double") \
        .write.mode("append").parquet(p)
    df = read_parquet_evolving(spark, p)
    assert set(df.columns) == {"id", "name", "score"}
    rows = {r.id: r.score for r in df.collect()}
    assert rows[1] is None and rows[2] == 9.5


def test_compact_parquet_reduces_file_count(spark, tmp_path):
    import glob

    from apache_beam_spark.sources.io import compact_parquet

    src, dest = str(tmp_path / "many"), str(tmp_path / "few")
    spark.range(10_000).repartition(64).write.parquet(src)
    assert len(glob.glob(src + "/*.parquet")) == 64
    n = compact_parquet(spark, src, dest, target_mb=512)
    assert n == 1
    assert len(glob.glob(dest + "/*.parquet")) == 1
    assert spark.read.parquet(dest).count() == 10_000
