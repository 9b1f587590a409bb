"""Streaming windowed CMS (streaming/cms.py): batch parity + late-drop."""

from __future__ import annotations

import tempfile

from pyspark.sql import functions as F

from apache_beam_spark.operators.sketches import count_min_sketch
from apache_beam_spark.streaming.cms import streaming_cms
from apache_beam_spark.streaming.sources import TestStream, read_bounded

SCHEMA = "ts bigint, item string"
M = 60_000_000                      # one minute in epoch micros
BASE = 24 * 60 * M                  # stay above the initial watermark
W = 10 * 60_000                     # 10-minute windows (ms)
DEPTH, WIDTH = 3, 8


def _ev(minutes, item):
    return {"ts": BASE + minutes * M, "item": item}


def _run(spark, batches):
    ts = TestStream(tempfile.mkdtemp(prefix="scms_"))
    for b in batches:
        ts.add_elements(b)
    sdf = streaming_cms(ts.stream(spark, SCHEMA), "item", window_ms=W,
                        depth=DEPTH, width=WIDTH)
    return {(r.window_start, r.r, r.b): r.cnt
            for r in read_bounded(sdf).collect()}


def test_batch_parity(spark):
    rows = ([_ev(1, "a")] * 5 + [_ev(2, "b")] * 3 + [_ev(3, "c")]
            + [_ev(12, "a")] * 2 + [_ev(14, "d")] * 4)
    # advance the watermark past both windows with a late-window tick
    got = _run(spark, [rows, [_ev(40, "zz")]])

    batch = spark.createDataFrame([(r["ts"], r["item"]) for r in rows],
                                  SCHEMA)
    win_us = W * 1000
    per_win = (batch.withColumn(
        "w", (F.floor(F.col("ts") / win_us) * win_us).cast("long")))
    ref = {}
    for wstart in [r["w"] for r in per_win.select("w").distinct().collect()]:
        sk = count_min_sketch(per_win.filter(F.col("w") == wstart),
                              "item", DEPTH, WIDTH)
        for r in sk.collect():
            ref[(wstart, r["r"], r["b"])] = r["cnt"]
    assert got == ref


def test_state_is_bounded_not_vocab_sized(spark):
    # 200 distinct items in one window -> at most DEPTH*WIDTH grid rows
    rows = [_ev(1, f"item-{i}") for i in range(200)]
    got = _run(spark, [rows, [_ev(40, "zz")]])
    w0 = BASE // (W * 1000) * (W * 1000)
    grid_rows = [k for k in got if k[0] == w0]
    assert grid_rows and len(grid_rows) <= DEPTH * WIDTH
    # total mass conserved: every row landed in each of the 3 grid rows
    assert sum(v for (ws, r, _), v in got.items()
               if ws == w0 and r == 0) == 200


def test_late_rows_dropped(spark):
    # watermark moves to minute 40; a late row for the first window
    # must not reopen it.  Spark's aggregation operator applies the
    # watermark with a ONE-micro-batch lag (the filter/eviction pass
    # uses the previous batch's frontier), so the advancing tick needs
    # one intervening batch before the late arrival — same discipline
    # as the streaming-minhash tests.
    b1 = [_ev(1, "a")] * 3
    b2 = [_ev(40, "zz")]
    b3 = [_ev(41, "zz")]            # lets the 40-minute frontier land
    b4 = [_ev(2, "a")] * 100        # very late
    b5 = [_ev(42, "zz")]
    got = _run(spark, [b1, b2, b3, b4, b5])
    w0 = BASE // (W * 1000) * (W * 1000)
    w0_total = sum(v for (ws, r, _), v in got.items()
                   if ws == w0 and r == 0)
    assert w0_total == 3
