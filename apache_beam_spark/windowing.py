"""Window functions and windowing strategy.

Reference model: windows are labels assigned to elements by a
``WindowFn`` and grouped per (key, window) later
(``transforms/windowing/WindowFn.java``; ``FixedWindows.java:36``,
``SlidingWindows.java:43``, ``Sessions.java:40``,
``CalendarWindows.java``, ``GlobalWindows.java``).  Spark instead
computes windows *at aggregation time* via ``window()`` /
``session_window()`` — identical results for the built-in fns, and far
cheaper: sliding-window duplication happens inside the codegen'd
aggregate instead of materializing N copies of every element through a
shuffle.

A ``WindowingStrategy`` (reference ``values/WindowingStrategy.java:45``)
is carried as metadata on each PCollection and *realized* when a
grouping operator runs — exactly the lazy design Spark wants.
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Optional

from pyspark.sql import Column
from pyspark.sql import functions as F


def ensure_event_time(df, col: str):
    """Normalize an event-time column to TIMESTAMP (with local-tz
    semantics): Spark's ``withWatermark`` rejects TIMESTAMP_NTZ, but
    parquet written with ``isAdjustedToUTC=false`` (and DuckDB's plain
    TIMESTAMP) arrives as NTZ.  Under the engine's UTC session timezone
    the cast is value-preserving, so batch/oracle results are unchanged
    while streaming gains a watermarkable column."""
    from pyspark.sql.types import TimestampNTZType

    if col in df.columns and isinstance(df.schema[col].dataType,
                                        TimestampNTZType):
        return df.withColumn(col, F.col(col).cast("timestamp"))
    return df


class WindowFn:
    """Base window function. Subclasses produce the grouping column(s)."""

    #: whether grouped output carries a window struct column
    windowed: bool = True

    def window_cols(self, ts_col: str) -> list[Column]:
        """Columns to add to a groupBy to realize this windowing."""
        raise NotImplementedError

    def describe(self) -> str:
        return type(self).__name__


@dataclass(frozen=True)
class GlobalWindows(WindowFn):
    """Single global window (reference ``GlobalWindows.java``)."""

    windowed = False

    def window_cols(self, ts_col: str) -> list[Column]:
        return []


@dataclass(frozen=True)
class FixedWindows(WindowFn):
    """Tumbling windows (reference ``FixedWindows.java:36,53``).

    ``size``/``offset`` are Spark interval strings, e.g. ``"10 minutes"``.
    """

    size: str
    offset: Optional[str] = None

    def window_cols(self, ts_col: str) -> list[Column]:
        if self.offset:
            return [F.window(F.col(ts_col), self.size, self.size, self.offset).alias("window")]
        return [F.window(F.col(ts_col), self.size).alias("window")]


@dataclass(frozen=True)
class SlidingWindows(WindowFn):
    """Sliding windows (reference ``SlidingWindows.java:43,69``).

    Each element lands in ``size/period`` windows; Spark expands inside
    the aggregate rather than at assignment time.
    """

    size: str
    period: str

    def window_cols(self, ts_col: str) -> list[Column]:
        return [F.window(F.col(ts_col), self.size, self.period).alias("window")]


@dataclass(frozen=True)
class Sessions(WindowFn):
    """Session windows with a gap (reference ``Sessions.java:40,49``).

    Two modes, both honest about the boundary:

    * default (``strict_gap=False``): Spark's ``session_window`` merges
      overlapping per-element proto-windows inside the native
      streaming/batch session aggregation operator, the same idea as
      the reference's ``MergeOverlappingIntervalWindows.java`` — with
      ONE boundary divergence (r9 review): at exact-gap adjacency the
      reference's ``IntervalWindow.isDisjoint`` treats
      ``end == other.start`` as disjoint (two events exactly one gap
      apart stay in SEPARATE sessions), while Spark merges them into
      one session.  ``window_session``, ``user_sessions`` and
      ``stream_session_exact`` follow the Spark convention.
    * ``strict_gap=True``: exact reference parity at the boundary —
      realized via ``merge_intervals(strict=True)`` on batch input
      (``apply``; ``session_window`` can't express it) and via
      ``streaming/stateful.py::streaming_sessions_strict`` on
      unbounded input.  Oracled end-to-end as
      ``window_session_strict``; boundary pinned in
      ``tests/test_strict_sessions.py``.
    """

    gap: str
    strict_gap: bool = False

    def window_cols(self, ts_col: str) -> list[Column]:
        if self.strict_gap:
            raise ValueError(
                "strict_gap Sessions cannot be a groupBy column "
                "(session_window merges touching windows); realize with "
                "Sessions.apply(df, keys, ts_col) and group by the "
                "produced 'window' struct")
        return [F.session_window(F.col(ts_col), self.gap).alias("window")]

    def apply(self, df, keys: list, ts_col: str, out: str = "window"):
        """Assign each row its merged session window as a struct column
        (batch path; honors ``strict_gap``).  One keyed sort-window
        shuffle — same scale shape as ``merge_intervals``."""
        tagged = (df.withColumn("__ws__", F.col(ts_col))
                  .withColumn("__we__", F.col(ts_col)
                              + F.expr(f"INTERVAL {self.gap}")))
        return merge_intervals(tagged, keys, "__ws__", "__we__", out,
                               strict=self.strict_gap) \
            .drop("__ws__", "__we__")


@dataclass(frozen=True)
class CalendarWindows(WindowFn):
    """Calendar-unit windows (reference ``CalendarWindows.java`` —
    days/months/years, timezone-aware).

    ``window()`` can't express months/years (variable length), so we
    derive window bounds from ``date_trunc`` — a plain Column expression,
    no custom Catalyst rule needed.  ``unit`` in
    {day, week, month, quarter, year}.  ``tz`` (IANA name) makes the
    boundary fall on the LOCAL calendar edge: truncate in wall-clock
    time, convert back — same day can differ by one across timezones,
    exactly the reference's DAYS.withTimeZone semantics.
    """

    unit: str
    tz: Optional[str] = None

    def window_cols(self, ts_col: str) -> list[Column]:
        t = F.col(ts_col)
        if self.tz:
            t = F.from_utc_timestamp(t, self.tz)
        start = F.date_trunc(self.unit, t)
        # months/quarters/years have variable length -> compute the
        # exclusive end with an interval add on the truncated start.
        n = {"day": (1, "days"), "week": (7, "days"), "month": (1, "months"),
             "quarter": (3, "months"), "year": (12, "months")}[self.unit]
        if n[1] == "days":
            end = start + F.expr(f"INTERVAL {n[0]} DAYS")
        else:
            end = start + F.expr(f"INTERVAL {n[0]} MONTHS")
        if self.tz:
            start = F.to_utc_timestamp(start, self.tz)
            end = F.to_utc_timestamp(end, self.tz)
        return [F.struct(start.alias("start"), end.alias("end")).alias("window")]


#: Reference accumulation modes (Window.java:261,273)
DISCARDING = "discarding"
ACCUMULATING = "accumulating"

#: Reference TimestampCombiner (windowing/TimestampCombiner.java)
END_OF_WINDOW = "end_of_window"
EARLIEST = "earliest"
LATEST = "latest"

#: output-timestamp column grouping operators attach when windowed
OUTPUT_TS_COL = "__event_time__"


def output_ts_agg(timestamp_combiner: str, event_time: str):
    """The extra aggregate realizing a TimestampCombiner
    (reference ``windowing/TimestampCombiner.java``): the grouped
    output element's timestamp is min/max of the inputs' timestamps for
    EARLIEST/LATEST; None for END_OF_WINDOW (derived from the window
    struct after the aggregate, no agg needed)."""
    if timestamp_combiner == EARLIEST:
        return F.min(F.col(event_time)).alias(OUTPUT_TS_COL)
    if timestamp_combiner == LATEST:
        return F.max(F.col(event_time)).alias(OUTPUT_TS_COL)
    if timestamp_combiner == END_OF_WINDOW:
        return None
    raise ValueError(f"unknown timestamp_combiner: {timestamp_combiner!r}")


@dataclass(frozen=True)
class WindowingStrategy:
    """Bundle of windowing metadata carried per-PCollection.

    Mirrors reference ``values/WindowingStrategy.java:45`` (accessors
    :109-145): (WindowFn, allowedLateness, accumulation mode,
    TimestampCombiner).  Triggers are handled at the streaming sink
    (output mode) — see streaming/.
    """

    window_fn: WindowFn = field(default_factory=GlobalWindows)
    allowed_lateness: Optional[str] = None  # Spark watermark delay
    accumulation_mode: str = DISCARDING
    timestamp_combiner: str = END_OF_WINDOW

    def with_window_fn(self, fn: WindowFn) -> "WindowingStrategy":
        return replace(self, window_fn=fn)

    @property
    def is_global(self) -> bool:
        return isinstance(self.window_fn, GlobalWindows)


def merge_intervals(df, keys: list, start_col: str, end_col: str,
                    out: str = "window", strict: bool = False):
    """Merge overlapping/touching [start, end) proto-windows per key —
    the batch realization of a custom MERGING WindowFn (reference
    ``WindowFn.mergeWindows`` / ``MergeOverlappingIntervalWindows.java``):
    each element's assigned proto-window is merged with any it overlaps,
    and every element gets its merged window back.

    Gaps-and-islands formulation (one shuffle + sort per key, no
    pairwise compare): sort by start, an island begins where start
    exceeds the running max of previous ends, island id = running count
    of island starts; the merged window is (min start, max end) per
    island.  Scales like any keyed window function — AQE handles skew.

    ``strict=True`` keeps TOUCHING intervals (start == previous end)
    separate — the reference's ``IntervalWindow.isDisjoint`` contract
    (``end == other.start`` is disjoint), which is what makes
    ``Sessions(gap, strict_gap=True)`` split events exactly one gap
    apart into separate sessions where Spark's ``session_window``
    would merge them.
    """
    from pyspark.sql.window import Window as W

    w_sort = W.partitionBy(*keys).orderBy(F.col(start_col), F.col(end_col))
    prev_max_end = F.max(F.col(end_col)).over(
        w_sort.rowsBetween(W.unboundedPreceding, -1))
    splits = (F.col(start_col) >= prev_max_end) if strict \
        else (F.col(start_col) > prev_max_end)
    new_island = F.when(prev_max_end.isNull() | splits, 1).otherwise(0)
    tagged = df.withColumn("__isl__", F.sum(new_island).over(
        w_sort.rowsBetween(W.unboundedPreceding, 0)))
    w_isl = W.partitionBy(*keys, "__isl__")
    return (tagged
            .withColumn(out, F.struct(
                F.min(F.col(start_col)).over(w_isl).alias("start"),
                F.max(F.col(end_col)).over(w_isl).alias("end")))
            .drop("__isl__"))


@dataclass(frozen=True)
class MergingWindows(WindowFn):
    """Custom merging WindowFn (reference ``WindowFn.java`` with
    ``mergeWindows``; built-in example ``Sessions.java``).  The user
    supplies ``assign``: ts Column -> (start, end) proto-window
    Columns; overlapping proto-windows of the same grouping key merge.

    Unlike the non-merging fns this cannot be a pure groupBy column —
    realize it explicitly with ``apply(df, keys)`` (which uses
    ``merge_intervals``) and group by the resulting ``window`` struct.
    ``Sessions(gap)`` is the special case Spark natively supports via
    ``session_window``; this class covers arbitrary user merge logic
    (e.g. per-element variable gaps).
    """

    assign: object  # Callable[[Column], tuple[Column, Column]]

    def window_cols(self, ts_col: str) -> list[Column]:
        raise ValueError(
            "merging WindowFn cannot be realized as a groupBy column; "
            "call MergingWindows.apply(df, keys, ts_col) first and group "
            "by the produced 'window' struct")

    def apply(self, df, keys: list, ts_col: str, out: str = "window"):
        start, end = self.assign(F.col(ts_col))
        tagged = df.withColumn("__ws__", start).withColumn("__we__", end)
        return merge_intervals(tagged, keys, "__ws__", "__we__", out) \
            .drop("__ws__", "__we__")
