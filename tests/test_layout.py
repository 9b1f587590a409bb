"""Z-order layout (plans/layout.py): Morton-code correctness and the
actual data-skipping payoff it exists for."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.plans.layout import zorder_by, zvalue, zvalue_sql


def test_zvalue_hand_example(spark):
    # x=0b11 -> bits at positions 0,2; y=0b01 -> bit at position 1
    row = (spark.createDataFrame([(3, 1)], "x long, y long")
           .select(zvalue(["x", "y"], bits=2).alias("z")).first())
    assert row["z"] == 0b111
    # asymmetry: column order matters
    row2 = (spark.createDataFrame([(1, 3)], "x long, y long")
            .select(zvalue(["x", "y"], bits=2).alias("z")).first())
    assert row2["z"] == 0b1011


def test_zvalue_matches_duckdb_twin(spark):
    import duckdb

    df = spark.createDataFrame(
        [(i, (i * 37) % 256, (i * 91) % 256) for i in range(500)],
        "id long, a long, b long")
    got = {r["id"]: r["z"] for r in
           df.select("id", zvalue(["a", "b"], bits=8).alias("z")).collect()}
    con = duckdb.connect()
    con.register("t", df.toPandas())
    exp = {i: z for i, z in con.execute(
        f"SELECT id, ({zvalue_sql(['a', 'b'], 8)}) AS z FROM t").fetchall()}
    assert got == exp


def test_zvalue_validation():
    with pytest.raises(ValueError, match="at least two"):
        zvalue(["a"])
    with pytest.raises(ValueError, match="exceeds"):
        zvalue(["a", "b", "c", "d"], bits=16)


def test_zorder_prunes_more_files_than_single_column_sort(spark, tmp_path):
    """The reason the operator exists: a 2-D box filter over a z-ordered
    layout touches far fewer files than over a single-column sort."""
    n, files = 64_000, 32
    df = spark.range(n).select(
        F.col("id"),
        F.pmod(F.xxhash64(F.col("id")), F.lit(256)).alias("a"),
        F.pmod(F.xxhash64(F.col("id"), F.lit(1)), F.lit(256)).alias("b"))

    zpath = os.path.join(str(tmp_path), "zorder")
    apath = os.path.join(str(tmp_path), "bya")
    zorder_by(df, ["a", "b"], bits=8, num_files=files) \
        .write.mode("overwrite").parquet(zpath)
    df.repartitionByRange(files, "a").sortWithinPartitions("a") \
        .write.mode("overwrite").parquet(apath)

    def files_touched(path):
        box = ((F.col("a").between(32, 47)) & (F.col("b").between(96, 111)))
        return (spark.read.parquet(path).filter(box)
                .select(F.input_file_name().alias("f"))
                .distinct().count())

    z_files, a_files = files_touched(zpath), files_touched(apath)
    # sort-by-a clusters only on a: every file in the a-range qualifies;
    # the z-layout bounds BOTH dimensions per curve segment
    assert z_files < a_files
    assert z_files <= files // 4
