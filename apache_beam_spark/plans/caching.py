"""Scoped lifecycle for operator-internal caches (VERDICT r4 item 6).

Several miners cache small internal frames (id/signature blocks) that
feed multiple plan branches — without the cache each branch re-scans
the expensive text/vector lineage.  But a builder returns a LAZY
DataFrame: the consuming action happens caller-side, so the builder
itself can never ``unpersist()``.  Left alone, every query run pins
its internal frames in storage memory for the session's lifetime — a
long-lived 100 TB driver session composing many pipelines accumulates
them until eviction pressure hurts every later job.

``cache_scoped(df)`` is the operators' replacement for ``df.cache()``:
it caches AND registers the frame so callers can release it.

Two release paths:

* ``with scoped_caches():`` — everything cache_scoped inside the block
  (build + action) is unpersisted on exit.  ``bench.py`` wraps each
  query run this way; a long-lived driver should too.
* ``release_caches(spark)`` — drains the global registry (frames
  registered outside any scope).  Idempotent; safe to call between
  pipelines.

Unpersisting is non-blocking and safe even if an action is still
running (Spark recomputes evicted blocks from lineage), so correctness
never depends on the release point — only memory hygiene does.
"""

from __future__ import annotations

import threading
from contextlib import contextmanager
from typing import Iterator, List

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_SCOPES: List[List[DataFrame]] = []   # innermost scope last
_GLOBAL: List[DataFrame] = []


def cache_scoped(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for release: into the innermost active
    ``scoped_caches()`` scope, else the global registry drained by
    ``release_caches()``."""
    df = df.cache()
    with _LOCK:
        (_SCOPES[-1] if _SCOPES else _GLOBAL).append(df)
    return df


def _unpersist_all(frames: List[DataFrame]) -> None:
    for df in frames:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    frames.clear()


@contextmanager
def scoped_caches() -> Iterator[None]:
    """Release every ``cache_scoped`` frame created inside the block on
    exit — run the consuming ACTION inside the block too, or the cache
    will be gone before it helps."""
    scope: List[DataFrame] = []
    with _LOCK:
        _SCOPES.append(scope)
    try:
        yield
    finally:
        with _LOCK:
            _SCOPES.remove(scope)
        _unpersist_all(scope)


def release_caches() -> None:
    """Drain the global registry (frames registered outside any
    scope).  Call between pipelines in a long-lived session."""
    with _LOCK:
        frames = list(_GLOBAL)
        _GLOBAL.clear()
    _unpersist_all(frames)
