"""TZ-aware calendar windows (reference CalendarWindows.withTimeZone)
and a LeaderBoard-style streaming integration test (the reference's
canonical streaming example, examples/java8 game pipelines)."""

from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_spark.streaming import TestStream, run_to_memory, windowed_aggregate
from apache_beam_spark.windowing import CalendarWindows, FixedWindows


def test_calendar_day_timezone_boundary(spark):
    # 2024-01-31 20:00 UTC is already Feb 1 in Sydney (+11)
    df = spark.createDataFrame([("2024-01-31 20:00:00",)], ["raw"]) \
        .select(F.col("raw").cast("timestamp").alias("ts"))

    utc = df.select(*CalendarWindows("month").window_cols("ts")).first()["window"]
    syd = df.select(*CalendarWindows("month", tz="Australia/Sydney")
                    .window_cols("ts")).first()["window"]

    assert str(utc["start"]) == "2024-01-01 00:00:00"
    # Sydney's February starts 2024-01-31 13:00 UTC
    assert str(syd["start"]) == "2024-01-31 13:00:00"
    assert str(syd["end"]) == "2024-02-29 13:00:00"  # leap February, tz-shifted


def test_calendar_window_contains_its_timestamp(spark):
    from apache_beam_spark.testing import check_window_fn_laws

    check_window_fn_laws(CalendarWindows("month", tz="America/New_York"),
                         ["2024-03-01 02:00:00", "2024-12-31 23:59:59"], spark)


def test_leaderboard_stream(spark, tmp_path):
    """LeaderBoard (examples/java8/.../game/LeaderBoard.java): windowed
    team scores over a stream, on-time pane + late-but-allowed update,
    update output mode (the early/speculative pane path)."""
    ts = TestStream(str(tmp_path / "spool"))
    ts.add_elements([{"team": "red", "ts": "2024-01-01 00:00:10", "score": 3},
                     {"team": "blue", "ts": "2024-01-01 00:00:20", "score": 5}])
    ts.add_elements([{"team": "red", "ts": "2024-01-01 00:00:40", "score": 2}])
    # watermark jumps past the window; late-but-within-lateness red event
    ts.add_elements([{"team": "blue", "ts": "2024-01-01 00:30:00", "score": 1}])
    ts.add_elements([{"team": "red", "ts": "2024-01-01 00:00:55", "score": 10}])

    sdf = windowed_aggregate(
        ts.stream(spark, "team string, ts timestamp, score long"),
        FixedWindows("1 minute"), "ts",
        aggs=[F.sum("score").alias("points")], keys=["team"],
        allowed_lateness="2 hours",   # generous: late red event is allowed
    )
    got = run_to_memory(sdf, "update")
    first_window = got.filter(F.col("window.start") == "2024-01-01 00:00:00")
    per_team_final = (first_window.groupBy("team")
                      .agg(F.max("points").alias("final")).collect())
    final = {r["team"]: r["final"] for r in per_team_final}
    # red: 3+2 on time, +10 late-but-allowed refinement = 15
    assert final == {"red": 15, "blue": 5}
    # update mode emitted the refinement as an extra pane for red
    red_panes = first_window.filter(F.col("team") == "red").count()
    assert red_panes >= 2
