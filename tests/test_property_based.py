"""Property-style tests (reference methodology §5.5: exhaustive
source-split / coder-law property checks — here, randomized
equivalence against independent reference implementations).

- asof_join ≡ pandas.merge_asof (backward) on random keyed event sets
- range_join ≡ brute-force cross-filter
- shingles: count/width laws on random text
"""

from __future__ import annotations

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from apache_beam_spark.operators.asof import asof_join
from apache_beam_spark.operators.rangejoin import range_join

# small, fast cases: a handful of keys, seconds-scale timestamps
_key = st.sampled_from(["k1", "k2", "k3"])
_sec = st.integers(min_value=0, max_value=3600)


def _to_ts(s):
    return pd.Timestamp("2024-01-01") + pd.Timedelta(seconds=s)


@st.composite
def _events(draw, min_size=0, max_size=12):
    rows = draw(st.lists(st.tuples(_key, _sec), min_size=min_size,
                         max_size=max_size))
    # unique (key, ts): duplicate right-side timestamps make the match
    # nondeterministic in BOTH implementations (tie-break undefined)
    rows = list({(k, s) for k, s in rows})
    return rows


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=_events(min_size=1), right=_events(min_size=1))
def test_asof_matches_pandas_merge_asof(spark, left, right):
    lpdf = pd.DataFrame([{"k": k, "lts": _to_ts(s), "lid": i}
                         for i, (k, s) in enumerate(left)])
    rpdf = pd.DataFrame([{"k": k, "rts": _to_ts(s), "rid": i}
                         for i, (k, s) in enumerate(right)])

    expected = pd.merge_asof(
        lpdf.sort_values("lts"), rpdf.sort_values("rts"),
        left_on="lts", right_on="rts", by="k", direction="backward")
    want = {int(r.lid): (None if pd.isna(r.rid) else int(r.rid))
            for r in expected.itertuples()}

    ldf = spark.createDataFrame(lpdf)
    rdf = spark.createDataFrame(rpdf)
    out = asof_join(ldf, rdf, on="k", left_ts="lts", right_ts="rts",
                    right_cols=["rid"])
    got = {r["lid"]: r["rid"] for r in out.collect()}
    assert got == want


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(left=_events(min_size=1, max_size=8), right=_events(min_size=1, max_size=8),
       lo=st.integers(-600, 600), width=st.integers(0, 900))
def test_range_join_matches_bruteforce(spark, left, right, lo, width):
    hi = lo + width
    lpdf = pd.DataFrame([{"k": k, "lts": _to_ts(s), "lid": i}
                         for i, (k, s) in enumerate(left)])
    rpdf = pd.DataFrame([{"k": k, "rts": _to_ts(s), "rid": i}
                         for i, (k, s) in enumerate(right)])

    want = set()
    for lrow in lpdf.itertuples():
        for rrow in rpdf.itertuples():
            d = (rrow.rts - lrow.lts).total_seconds()
            if rrow.k == lrow.k and lo <= d <= hi:
                want.add((lrow.lid, rrow.rid))

    out = range_join(spark.createDataFrame(lpdf), spark.createDataFrame(rpdf),
                     on="k", left_ts="lts", right_ts="rts",
                     lower=f"{lo} seconds", upper=f"{hi} seconds")
    got = {(r["lid"], r["rid"]) for r in out.collect()}
    assert got == want


@settings(max_examples=15, deadline=None,
          suppress_health_check=[HealthCheck.too_slow])
@given(words=st.lists(st.text(alphabet="abcxyz", min_size=1, max_size=5),
                      min_size=0, max_size=10),
       k=st.integers(1, 4))
def test_shingles_laws(spark, words, k):
    from apache_beam_spark.functions.text import shingles

    text = " ".join(words)
    df = spark.createDataFrame([(text,)], ["t"])
    out = df.select(shingles(F.col("t"), k).alias("sh")).first()["sh"]
    n = len(words)
    if n >= k:
        assert len(out) == n - k + 1          # count law
        assert all(len(s.split(" ")) == k for s in out)  # width law
    else:
        assert out == [" ".join(words)]       # short-doc fallback
