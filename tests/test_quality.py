"""Data-quality constraints operator (operators/quality.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from apache_beam_spark.operators import quality as Q


@pytest.fixture()
def people(spark):
    return spark.createDataFrame(
        [(1, "a@x.com", 25, "US"),
         (2, None, 16, "DE"),          # null email, age < 18
         (3, "bad-email", 40, "XX"),   # bad regex, bad country
         (3, "c@x.com", 30, "US"),     # duplicate id
         (None, "d@x.com", 200, "US")],  # null id, age > 120
        "id long, email string, age long, country string")


def test_report_counts(spark, people):
    ref = spark.createDataFrame([("US",), ("DE",)], "code string")
    rules = [
        Q.not_null("id_not_null", "id"),
        Q.not_null("email_not_null", "email"),
        Q.in_range("age_adult", "age", 18, 120),
        Q.isin("country_domain", "country", ["US", "DE"]),
        Q.matches("email_shape", "email", r"^[^@]+@[^@]+$"),
        Q.unique("id_unique", "id"),
        Q.foreign_key("country_fk", "country", ref, "code"),
        Q.custom("id_lt_100", F.col("id") < 100),
    ]
    got = {r["rule"]: (r["kind"], r["n_violations"])
           for r in Q.check_constraints(people, rules).collect()}
    assert got["id_not_null"] == ("not_null", 1)
    assert got["email_not_null"] == ("not_null", 1)
    assert got["age_adult"] == ("range", 2)          # 16 and 200
    assert got["country_domain"] == ("isin", 1)      # XX
    assert got["email_shape"] == ("regex", 1)        # bad-email (nulls pass)
    assert got["id_unique"] == ("unique", 2)         # both id=3 rows counted
    assert got["country_fk"] == ("foreign_key", 1)   # XX
    assert got["id_lt_100"] == ("custom", 1)         # NULL id -> violation


def test_row_rules_share_one_scan(spark, people):
    """All row-level rules fold into a single aggregation — the plan
    reads the input once (one scan node)."""
    from apache_beam_spark.plans import plan_string

    rules = [Q.not_null("a", "id"), Q.in_range("b", "age", 0, 100),
             Q.matches("c", "email", ".+")]
    import re

    plan = plan_string(Q.check_constraints(people, rules)) \
        .split("Initial Plan")[0]
    # detail-section form "(n) Scan ..." only (the outline repeats it)
    assert len(re.findall(r"\(\d+\) Scan ExistingRDD", plan)) <= 1


def test_enforce_raises_in_plan(spark, people):
    ok = people.filter(F.col("id") == 1)
    out = Q.enforce_constraints(ok, [Q.in_range("age_ok", "age", 18, 120)])
    assert out.count() == 1  # clean rows pass through
    bad = Q.enforce_constraints(people, [Q.in_range("age_ok", "age", 18, 120)])
    with pytest.raises(Exception, match="DQ violation: age_ok"):
        bad.count()


def test_validation_errors(spark, people):
    with pytest.raises(ValueError, match="at least one"):
        Q.check_constraints(people, [])
    with pytest.raises(ValueError, match="duplicate rule names"):
        Q.check_constraints(people, [Q.not_null("x", "id"),
                                     Q.not_null("x", "email")])
    with pytest.raises(ValueError, match="row-level only"):
        Q.enforce_constraints(people, [Q.unique("u", "id")])
    # names are interpolated into stack() literals AND agg aliases —
    # non-identifier names must be rejected at validation, not become a
    # plan-time parse error or injected SQL
    for bad in ["has space", "has-dash", "has.dot", "q'uote",
                "1leading", ""]:
        with pytest.raises(ValueError, match="identifiers"):
            Q.check_constraints(people, [Q.not_null(bad, "id")])
