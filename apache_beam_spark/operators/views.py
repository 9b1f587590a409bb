"""Side-input views (reference ``transforms/View.java:168-237``:
asSingleton / asIterable / asList / asMap / asMultimap, materialized by
``PCollectionView``).

Spark realization: small sides collect to driver values captured in
task closures (Spark broadcasts closures), or — the scalable path — stay
distributed as a ``F.broadcast`` join (``operators/join.py``).  These
helpers are the collect path, with the same uniqueness contracts the
reference enforces (singleton view of a multi-element collection is an
error; asMap duplicate keys are an error)."""

from __future__ import annotations

from typing import Any, Optional

from pyspark.sql import DataFrame


#: default driver-side materialization cap (rows); views are for small
#: sides — a fact table must go through a broadcast join instead
DEFAULT_MAX_VIEW_ROWS = 100_000


def _df(pcoll) -> DataFrame:
    return getattr(pcoll, "df", pcoll)


def guarded_collect(df: DataFrame, max_rows: int = DEFAULT_MAX_VIEW_ROWS) -> list:
    """Collect with a size guard: a side input larger than ``max_rows``
    raises instead of OOM-ing the driver, steering the caller to the
    distributed path (``Join(..., broadcast=True)`` /
    ``F.broadcast``)."""
    rows = df.limit(max_rows + 1).collect()
    if len(rows) > max_rows:
        raise ValueError(
            f"side-input view exceeds {max_rows} rows; driver-side views "
            "are for small sides — use a broadcast join "
            "(operators.join.Join(..., broadcast=True)) or raise max_rows "
            "explicitly if the side genuinely fits driver memory")
    return rows


class View:
    @staticmethod
    def as_singleton(pcoll, default: Optional[Any] = None) -> Any:
        """View.asSingleton (View.java:168): exactly one element (or a
        default for empty)."""
        rows = _df(pcoll).limit(2).collect()
        if len(rows) == 0:
            if default is not None:
                return default
            raise ValueError("asSingleton of empty PCollection with no default")
        if len(rows) > 1:
            raise ValueError("asSingleton of PCollection with >1 element")
        r = rows[0]
        return r[0] if len(r) == 1 else r

    @staticmethod
    def as_list(pcoll, max_rows: int = DEFAULT_MAX_VIEW_ROWS) -> list:
        """View.asList (View.java:179)."""
        return [r[0] if len(r) == 1 else tuple(r)
                for r in guarded_collect(_df(pcoll), max_rows)]

    as_iterable = as_list  # View.asIterable (:192) — same materialization

    @staticmethod
    def as_map(pcoll, key_col: Optional[str] = None, value_col: Optional[str] = None,
               max_rows: int = DEFAULT_MAX_VIEW_ROWS) -> dict:
        """View.asMap (View.java:216): unique keys required."""
        df = _df(pcoll)
        k, v = key_col or df.columns[0], value_col or df.columns[1]
        out: dict = {}
        for r in guarded_collect(df.select(k, v), max_rows):
            if r[0] in out:
                raise ValueError(f"asMap duplicate key: {r[0]!r}")
            out[r[0]] = r[1]
        return out

    @staticmethod
    def as_multimap(pcoll, key_col: Optional[str] = None, value_col: Optional[str] = None,
                    max_rows: int = DEFAULT_MAX_VIEW_ROWS) -> dict:
        """View.asMultimap (View.java:237): key -> list of values."""
        df = _df(pcoll)
        k, v = key_col or df.columns[0], value_col or df.columns[1]
        out: dict = {}
        for r in guarded_collect(df.select(k, v), max_rows):
            out.setdefault(r[0], []).append(r[1])
        return out
