"""In-pipeline golden assertions + property checkers.

Reference test surface (SURVEY.md §5):
  ``PAssert.that(pcoll).containsInAnyOrder(...)`` (testing/PAssert.java:357,263)
  window-scoped variants ``inWindow`` (:215)
  CombineFn laws (testing/CombineFnTester.java)
  WindowFn laws (testing/WindowFnTestUtils.java)

The bag-equality semantics (unordered, duplicates counted) are the
reference's exactly; here they run driver-side over collected rows —
our pipelines are bounded test-scale when asserted on, and the DuckDB
oracle gate plays the scale role.
"""

from __future__ import annotations

from collections import Counter
from typing import Any, Iterable, Sequence, Union

from pyspark.sql import DataFrame, Row


def _as_bag(rows: Iterable[Any]) -> Counter:
    def norm(r):
        if isinstance(r, Row):
            return tuple(r)
        if isinstance(r, dict):
            return tuple(r[k] for k in sorted(r))
        if isinstance(r, (list, tuple)):
            return tuple(r)
        return (r,)
    return Counter(norm(r) for r in rows)


class PAssert:
    """reference testing/PAssert.java — golden assertions on a
    PCollection/DataFrame, bag semantics (unordered, multiplicity
    matters)."""

    def __init__(self, pcoll: Union[DataFrame, "Any"]):
        df = getattr(pcoll, "df", pcoll)
        self._df: DataFrame = df

    @staticmethod
    def that(pcoll) -> "PAssert":
        return PAssert(pcoll)

    def contains_in_any_order(self, *expected: Any) -> "PAssert":
        """PAssert.java:263 containsInAnyOrder."""
        got, want = _as_bag(self._df.collect()), _as_bag(expected)
        assert got == want, (
            f"bag mismatch:\n  missing: {list((want - got).elements())[:10]}"
            f"\n  unexpected: {list((got - want).elements())[:10]}")
        return self

    def is_empty(self) -> "PAssert":
        assert self._df.limit(1).count() == 0, "expected empty PCollection"
        return self

    def satisfies(self, fn) -> "PAssert":
        """PAssert.satisfies — arbitrary predicate over the collected bag."""
        fn(self._df.collect())
        return self

    def in_window(self, start: str, end: str, window_col: str = "window") -> "PAssert":
        """Window-scoped view (PAssert.java:215 inWindow): narrow
        subsequent assertions to one window."""
        from pyspark.sql import functions as F

        return PAssert(self._df.filter(
            (F.col(f"{window_col}.start") == F.lit(start).cast("timestamp"))
            & (F.col(f"{window_col}.end") == F.lit(end).cast("timestamp"))
        ).drop(window_col))


def check_combine_fn_laws(fn, sample_values: Sequence[Any], splits: int = 3) -> None:
    """CombineFn associativity/commutativity laws
    (testing/CombineFnTester.java): any partition of the input into
    accumulators, merged in any order, must yield the same output."""
    import itertools
    import random

    base_acc = fn.add_inputs(fn.create_accumulator(), list(sample_values))
    expected = fn.extract_output(base_acc)

    rng = random.Random(42)
    vals = list(sample_values)
    for trial in range(5):
        rng.shuffle(vals)
        cut = sorted(rng.sample(range(len(vals) + 1), min(splits - 1, len(vals))))
        parts, prev = [], 0
        for c in [*cut, len(vals)]:
            parts.append(vals[prev:c]); prev = c
        accs = [fn.add_inputs(fn.create_accumulator(), p) for p in parts]
        rng.shuffle(accs)
        got = fn.extract_output(fn.merge_accumulators(accs))
        assert got == expected, f"CombineFn law violated: {got} != {expected}"


def check_window_fn_laws(window_fn, timestamps: Sequence[str], spark) -> None:
    """WindowFn laws (testing/WindowFnTestUtils.java): every element is
    assigned ≥1 window and the element's timestamp falls inside each
    assigned window's bounds."""
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(t,) for t in timestamps], ["ts_raw"]) \
        .select(F.col("ts_raw").cast("timestamp").alias("ts"))
    cols = window_fn.window_cols("ts")
    if not cols:
        return  # GlobalWindows: vacuously true
    out = df.select(F.col("ts"), *cols).collect()
    for r in out:
        w = r["window"]
        assert w["start"] <= r["ts"] < w["end"], f"{r['ts']} outside {w}"
