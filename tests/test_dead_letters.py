"""Dead-letter (error side-output) ParDo tests."""

from __future__ import annotations

from apache_beam_spark.operators.elementwise import with_dead_letters


def test_dead_letters_split(spark):
    df = spark.createDataFrame(
        [("1", "a"), ("2", "b"), ("oops", "c"), ("4", "d")], ["num", "tag"])

    def fn(row):
        return {"n": int(row["num"]) * 10, "tag": row["tag"]}

    ok, errors = with_dead_letters(df, fn, "n long, tag string")
    good = sorted((r["n"], r["tag"]) for r in ok.collect())
    assert good == [(10, "a"), (20, "b"), (40, "d")]
    errs = errors.collect()
    assert len(errs) == 1
    assert "ValueError" in errs[0]["error"] and "oops" in errs[0]["row"]


def test_dead_letters_all_ok(spark):
    df = spark.createDataFrame([(1,), (2,)], ["v"])
    ok, errors = with_dead_letters(df, lambda r: {"v": r["v"]}, "v long")
    assert ok.count() == 2 and errors.count() == 0
