from __future__ import annotations

import datetime as dt

from apache_beam_spark.operators.sequences import funnel_instances

T0 = dt.datetime(2024, 1, 1)


def _ev(spark, rows):
    return spark.createDataFrame(
        [(i, u, T0 + dt.timedelta(minutes=m), t) for i, (u, m, t) in enumerate(rows)],
        ["event_id", "user_id", "ts", "event_type"])


def test_chained_earliest_match(spark):
    ev = _ev(spark, [
        (1, 0, "view"), (1, 5, "click"), (1, 8, "click"), (1, 12, "purchase"),
        (2, 0, "view"), (2, 40, "click"),          # click too late for 30m bound
        (3, 0, "click"), (3, 5, "purchase"),        # no anchoring view
    ])
    out = funnel_instances(ev, ["view", "click", "purchase"], "30 minutes").collect()
    assert len(out) == 1
    r = out[0]
    assert r.user_id == 1
    # earliest click (t+5), then earliest purchase after THAT click
    assert (r.click_ts - r.view_ts).total_seconds() == 300
    assert (r.purchase_ts - r.view_ts).total_seconds() == 720


def test_second_step_window_anchors_on_matched_event(spark):
    # purchase is 25m after the click but 45m after the view: the bound
    # applies per step, so the chain completes
    ev = _ev(spark, [(5, 0, "view"), (5, 20, "click"), (5, 45, "purchase")])
    out = funnel_instances(ev, ["view", "click", "purchase"], "30 minutes").collect()
    assert len(out) == 1


def test_each_anchor_matches_independently(spark):
    ev = _ev(spark, [
        (7, 0, "view"), (7, 10, "view"), (7, 15, "click"), (7, 20, "purchase"),
    ])
    out = funnel_instances(ev, ["view", "click", "purchase"], "30 minutes").collect()
    # both views resolve to the same (click, purchase) pair
    assert len(out) == 2
    assert len({r.click_ts for r in out}) == 1


def test_equal_ts_chained_events_no_fanout(spark):
    # two clicks at the SAME instant: the chain pointer is a pure
    # function of (user, ts), so the link join must not duplicate the
    # instance, and the purchase must still resolve once
    ev = _ev(spark, [
        (11, 0, "view"), (11, 5, "click"), (11, 5, "click"),
        (11, 9, "purchase"),
    ])
    out = funnel_instances(ev, ["view", "click", "purchase"], "30 minutes").collect()
    assert len(out) == 1
    assert (out[0].purchase_ts - out[0].click_ts).total_seconds() == 240


def test_strictly_after_excludes_equal_ts(spark):
    # a click at exactly the view's timestamp is NOT "after" it
    ev = _ev(spark, [(13, 0, "view"), (13, 0, "click"), (13, 4, "purchase")])
    out = funnel_instances(ev, ["view", "click", "purchase"], "30 minutes").collect()
    assert out == []


def test_two_step_pattern(spark):
    ev = _ev(spark, [(9, 0, "view"), (9, 10, "purchase"), (9, 70, "view")])
    out = funnel_instances(ev, ["view", "purchase"], "30 minutes").collect()
    assert len(out) == 1 and (out[0].purchase_ts - out[0].view_ts).total_seconds() == 600


def test_regex_kv_and_replace_first(spark):
    """Regex.matchesKV (Regex.java:137) and replaceFirst (:646)."""
    from apache_beam_spark.operators.elementwise import Regex
    from apache_beam_spark.pipeline import Pipeline

    p = Pipeline(spark)
    pc = p.from_df(spark.createDataFrame(
        [("a=1",), ("junk",), ("b=2",)], "line string"))
    kv = pc | Regex.matches_kv("line", r"(\w+)=(\w+)")
    assert sorted((r["key"], r["value"]) for r in kv.df.collect()) == \
        [("a", "1"), ("b", "2")]        # non-matching row dropped
    rf = pc | Regex.replace_first("line", r"\w", "X")
    assert sorted(r["line"] for r in rf.df.collect()) == \
        ["X=1", "X=2", "Xunk"]          # only the FIRST match replaced
