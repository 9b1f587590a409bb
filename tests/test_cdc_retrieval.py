"""Round-3 coverage additions: CDC upsert/SCD2 merge, BM25 retrieval,
temperature mixture budgets."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.operators.cdc import (
    apply_changes,
    latest_changes,
    scd2_history,
)
from apache_beam_spark.operators.mixing import temperature_budgets
from apache_beam_spark.operators.retrieval import bm25_topk


def _base(spark):
    return spark.createDataFrame(
        [(1, 10, "alice"), (2, 10, "bob"), (3, 10, "carol")],
        "id long, seq long, payload string")


def _changes(spark):
    return spark.createDataFrame(
        [(2, 20, "bob2", "U"),     # update
         (3, 20, "x", "D"),        # delete
         (4, 20, "dave", "U"),     # insert
         (4, 25, "dave2", "U"),    # later update wins
         (5, 20, "eve", "U"),
         (5, 20, "eve2", "U")],    # same seq: tiebreak decides
        "id long, seq long, payload string, op string")


def test_apply_changes_upsert_delete_insert(spark):
    changes = _changes(spark).withColumn(
        "tb", F.monotonically_increasing_id())
    out = apply_changes(_base(spark), changes.drop("tb"),
                        keys=["id"], seq_col="seq")
    got = {r["id"]: r["payload"] for r in out.collect()}
    assert got[1] == "alice"      # untouched base row passes through
    assert got[2] == "bob2"       # updated
    assert 3 not in got           # deleted
    assert got[4] == "dave2"      # insert then update: latest wins
    assert set(got) == {1, 2, 4, 5}


def test_latest_changes_tiebreak_deterministic(spark):
    changes = spark.createDataFrame(
        [(5, 20, "eve", "U", 1), (5, 20, "eve2", "U", 2)],
        "id long, seq long, payload string, op string, tb long")
    row = latest_changes(changes, ["id"], "seq", tiebreak="tb").first()
    assert row["payload"] == "eve2"  # highest (seq, tb) wins


def test_scd2_history_intervals(spark):
    changes = spark.createDataFrame(
        [(1, 10, "a"), (1, 20, "b"), (1, 30, "c"), (2, 15, "z")],
        "id long, seq long, payload string")
    out = {(r["id"], r["seq"]): (r["valid_from"], r["valid_to"], r["is_current"])
           for r in scd2_history(changes, ["id"], "seq").collect()}
    assert out[(1, 10)] == (10, 20, False)
    assert out[(1, 20)] == (20, 30, False)
    assert out[(1, 30)] == (30, None, True)
    assert out[(2, 15)] == (15, None, True)


def test_apply_changes_single_shuffle_key(spark):
    """The merge must not introduce shuffles on anything but the key."""
    from apache_beam_spark.plans import plan_string

    out = apply_changes(_base(spark), _changes(spark),
                        keys=["id"], seq_col="seq")
    plan = plan_string(out)
    assert "CartesianProduct" not in plan


def test_bm25_hand_example(spark):
    docs = spark.createDataFrame(
        [(0, "spark spark join"), (1, "join filter"), (2, "other words here")],
        "doc_id long, text string")
    out = {r["doc_id"]: r["score"]
           for r in bm25_topk(docs, ["spark", "join"], k=3).collect()}
    # hand computation: N=3, avgdl = (3+2+3)/3
    def idf(df):
        return math.log(1.0 + (3 - df + 0.5) / (df + 0.5))
    def part(tf, dl, df, avgdl=8/3, k1=1.2, b=0.75):
        return idf(df) * tf * (k1 + 1) / (tf + k1 * (1 - b + b * dl / avgdl))
    exp0 = round(part(2, 3, 1) + part(1, 3, 2), 6)   # spark(df=1) + join(df=2)
    exp1 = round(part(1, 2, 2), 6)
    assert out[0] == pytest.approx(exp0, abs=1e-6)
    assert out[1] == pytest.approx(exp1, abs=1e-6)
    assert 2 not in out                               # no query terms -> no row
    ranks = {r["doc_id"]: r["rank"]
             for r in bm25_topk(docs, ["spark", "join"], k=3).collect()}
    assert ranks[0] == 1 and ranks[1] == 2


def test_bm25_no_one_partition_window(spark):
    from apache_beam_spark.plans import plan_string

    docs = spark.createDataFrame(
        [(i, "spark join") for i in range(50)], "doc_id long, text string")
    plan = plan_string(bm25_topk(docs, ["spark"], k=5))
    assert "TakeOrderedAndProject" in plan


def test_temperature_budgets(spark):
    docs = spark.createDataFrame(
        [(i, "w " * (100 if i % 2 == 0 else 25), "big" if i % 2 == 0 else "small")
         for i in range(20)],
        "doc_id long, text string, source string")
    b = temperature_budgets(docs, total_budget=1000, temperature=2.0)
    # tokens: big=1000, small=250 -> sqrt ratio 2:1 -> ~666/333
    assert b["big"] == 666 and b["small"] == 333
    # T=1 reproduces natural proportions
    b1 = temperature_budgets(docs, total_budget=1000, temperature=1.0)
    assert b1["big"] == 800 and b1["small"] == 200
    with pytest.raises(ValueError):
        temperature_budgets(docs, 1000, temperature=0)


def test_apply_changes_null_key_fails_loudly(spark):
    changes = spark.createDataFrame(
        [(None, 20, "ghost", "U")],
        "id long, seq long, payload string, op string")
    out = apply_changes(_base(spark), changes, keys=["id"], seq_col="seq")
    with pytest.raises(Exception, match="NULL merge key"):
        out.count()


def test_derive_changes_and_round_trip_law(spark):
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c")], "id long, payload string")
    new = spark.createDataFrame(
        [(1, "a"), (2, "b2"), (4, "d")], "id long, payload string")
    from apache_beam_spark.operators.cdc import derive_changes

    ch = derive_changes(old, new, keys=["id"])
    got = {r["id"]: (r["op"], r["payload"]) for r in ch.collect()}
    assert got == {2: ("U", "b2"), 3: ("D", "c"), 4: ("I", "d")}

    # round-trip law: applying the derived changelog reproduces new
    applied = apply_changes(
        old.withColumn("seq", F.lit(0)),
        ch.withColumn("seq", F.lit(1)), keys=["id"], seq_col="seq")
    assert sorted(map(tuple, applied.select("id", "payload").collect())) == \
        sorted(map(tuple, new.collect()))
