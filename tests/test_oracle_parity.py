"""Local mirror of the driver's t2 correctness gate.

Runs every ``queries()`` entry at sf0.001 and compares the result with
its ``oracle_sql()`` DuckDB twin: row count, column names, and
order-insensitive values — the same contract as CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def _canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].astype(str)
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
        if str(df[c].dtype) in ("float64", "float32"):
            df[c] = df[c].astype("float64").round(6)
        if str(df[c].dtype).startswith(("int", "uint", "Int")):
            df[c] = df[c].astype("int64")
    return df.sort_values(by=list(df.columns)).reset_index(drop=True)


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(name, spark, duck):
    sdf = QUERIES[name](spark, SF_DIR).toPandas()
    if name not in ORACLES:
        # rows-only contract for non-SQL-expressible ops
        assert len(sdf) >= 0
        return
    odf = duck.execute(ORACLES[name]).fetchdf()
    assert len(sdf) == len(odf), f"{name}: rows {len(sdf)} != oracle {len(odf)}"
    s, o = _canon(sdf), _canon(odf)
    assert list(s.columns) == list(o.columns), f"{name}: columns {list(s.columns)} != {list(o.columns)}"
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=False,
                                  rtol=0, atol=1e-9, obj=name)


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert len(df.columns) > 0
