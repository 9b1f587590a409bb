from __future__ import annotations

from pyspark.sql import functions as F

from apache_beam_spark.functions.pii import pii_count, scrub_pii


def _one(spark, text, expr):
    return spark.range(1).select(expr(F.lit(text)).alias("v")).first().v


def test_scrub_all_kinds(spark):
    out = _one(spark, "mail a.b@x.io ip 192.168.0.1 ph 555-123-4567 s 123-45-6789",
               lambda c: scrub_pii(c))
    assert out == "mail <EMAIL> ip <IP> ph <PHONE> s <SSN>"


def test_ssn_not_eaten_by_phone(spark):
    # SSN is 3-2-4; the phone pattern (3-3-4) must not half-match it
    out = _one(spark, "123-45-6789", lambda c: scrub_pii(c))
    assert out == "<SSN>"


def test_counts(spark):
    row = spark.range(1).select(
        pii_count(F.lit("a@b.co and c@d.org call 555-123-4567"), "email").alias("e"),
        pii_count(F.lit("a@b.co and c@d.org call 555-123-4567"), "phone").alias("p"),
    ).first()
    assert (row.e, row.p) == (2, 1)


def test_selective_kinds(spark):
    out = _one(spark, "a@b.co at 10.0.0.1", lambda c: scrub_pii(c, kinds=["ipv4"]))
    assert out == "a@b.co at <IP>"
