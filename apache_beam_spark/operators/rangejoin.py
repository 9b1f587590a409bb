"""Interval/range join — the other time-series join the reference lacks
(SURVEY.md §2.4) and Spark plans as a broadcast-nested-loop unless told
otherwise.

Scalable formulation: the match window for a left row is
``[left_ts + lower, left_ts + upper]`` — width W = upper - lower.  Bin
all RIGHT timestamps into W-wide bins; the window can overlap at most
two adjacent bins, so each left row probes ``bin(left_ts + lower)`` and
the next one — an EQUI-join on (key, bin) with a post-filter.  One hash
shuffle, cost linear in matches-per-bin instead of |L| x |R| per key.
"""

from __future__ import annotations

import re
from typing import Optional

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_UNIT_S = {"second": 1, "seconds": 1, "minute": 60, "minutes": 60,
           "hour": 3600, "hours": 3600, "day": 86400, "days": 86400}


def _interval_seconds(s: str) -> int:
    m = re.fullmatch(r"\s*(-?\d+)\s+(\w+)\s*", s)
    if not m or m.group(2) not in _UNIT_S:
        raise ValueError(f"unsupported interval: {s!r} (use e.g. '-30 minutes')")
    return int(m.group(1)) * _UNIT_S[m.group(2)]


def range_join(left: DataFrame, right: DataFrame, on: Optional[str],
               left_ts: str, right_ts: str,
               lower: str = "0 seconds", upper: str = "1 hour",
               how: str = "inner") -> DataFrame:
    """Pairs where ``right_ts - left_ts`` ∈ [lower, upper] (bounds may
    be negative/offset, e.g. lower="-1 hour"), optionally also
    equi-keyed on ``on``.  Column name collisions besides ``on`` must be
    pre-renamed.

    Outer modes are real: the bucketized join is computed as INNER
    (outer on the exploded probe would both duplicate unmatched left
    rows and then drop them in the range filter), and unmatched rows
    are recovered with a null-safe anti-join per outer side — one extra
    shuffle per side, still no nested loop.
    """
    if how not in ("inner", "left", "right", "full"):
        raise ValueError(f"range_join: unsupported how={how!r}")
    lo_s, hi_s = _interval_seconds(lower), _interval_seconds(upper)
    if hi_s < lo_s:
        raise ValueError("upper must be >= lower")
    width = max(hi_s - lo_s, 1)  # zero-width window -> 1s bins + filter

    lshift = F.unix_timestamp(F.col(left_ts)) + F.lit(lo_s)
    lbin = F.floor(lshift / F.lit(width))
    rbin = F.floor(F.unix_timestamp(F.col(right_ts)) / F.lit(width))

    l = left.withColumn(
        "__probe__", F.explode(F.array(lbin, lbin + 1)))
    r = right.withColumn("__probe__", rbin)

    keys = ["__probe__"] + ([on] if on else [])
    joined = l.join(r, on=keys, how="inner")
    diff = F.unix_timestamp(F.col(right_ts)) - F.unix_timestamp(F.col(left_ts))
    # no dedup needed: a right row lives in exactly one bin, and the two
    # probed bins are distinct, so each (left, right) pair joins once
    inner = joined.filter((diff >= lo_s) & (diff <= hi_s)).drop("__probe__")
    if how == "inner":
        return inner

    def _unmatched(side: DataFrame, pad_from: DataFrame) -> DataFrame:
        cols = list(side.columns)
        s, m = side.alias("__s__"), inner.select(*cols).alias("__m__")
        cond = None
        for c in cols:  # null-safe: rows with NULLs must still match
            e = F.col(f"__s__.{c}").eqNullSafe(F.col(f"__m__.{c}"))
            cond = e if cond is None else cond & e
        out = s.join(m, on=cond, how="left_anti")
        for c in [c for c in pad_from.columns if c not in cols]:
            out = out.withColumn(c, F.lit(None).cast(pad_from.schema[c].dataType))
        return out

    result = inner
    if how in ("left", "full"):
        result = result.unionByName(_unmatched(left, right).select(*result.columns))
    if how in ("right", "full"):
        result = result.unionByName(_unmatched(right, left).select(*result.columns))
    return result
