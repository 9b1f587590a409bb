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
  (build + action) is unpersisted on exit.  Scope stacks are
  THREAD-LOCAL: concurrent driver threads each track only their own
  registrations, so one thread's scope exit never unpersists frames
  another thread's queries still rely on.  Pick the scope boundary to
  match legitimate reuse: ``bench.py`` wraps the WHOLE suite in one
  scope (Spark's CacheManager shares identical cached subplans across
  separately-built DataFrames — the ngram family reuses one postings
  cache), while ``scripts/scale_check.py`` scopes per query for
  isolated measurements.
* ``release_caches()`` — drains the global registry (frames registered
  outside any scope, from any thread).  Idempotent; safe to call
  between pipelines.

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
_LOCAL = threading.local()            # per-thread scope stack
_GLOBAL: List[DataFrame] = []


def _scopes() -> List[List[DataFrame]]:
    """This thread's scope stack, innermost last — thread-local so
    concurrent driver threads can't release each other's caches
    (ADVICE r5: a shared stack let one thread's scope exit unpersist
    frames another thread's running queries depended on)."""
    stack = getattr(_LOCAL, "scopes", None)
    if stack is None:
        stack = _LOCAL.scopes = []
    return stack


def cache_scoped(df: DataFrame) -> DataFrame:
    """``df.cache()`` + register for release: into the calling thread's
    innermost active ``scoped_caches()`` scope, else the global
    registry drained by ``release_caches()``."""
    df = df.cache()
    stack = _scopes()
    if stack:
        stack[-1].append(df)
    else:
        with _LOCK:
            _GLOBAL.append(df)
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
    """Release every ``cache_scoped`` frame created inside the block BY
    THIS THREAD on exit — run the consuming ACTION inside the block
    too, or the cache will be gone before it helps."""
    scope: List[DataFrame] = []
    stack = _scopes()
    stack.append(scope)
    try:
        yield
    finally:
        stack.remove(scope)
        _unpersist_all(scope)


def release_caches() -> None:
    """Drain the global registry (frames registered outside any
    scope).  Call between pipelines in a long-lived session."""
    with _LOCK:
        frames = list(_GLOBAL)
        _GLOBAL.clear()
    _unpersist_all(frames)


def persistent_rdd_ids(sc) -> set:
    """Snapshot of the ids currently in the context's persistent-RDD
    registry.  Cache-hygiene checks must compare these as SET DELTAS
    (ids added by the code under test, ids removed on release), never
    as raw counts: Spark's ContextCleaner asynchronously reclaims
    unreferenced entries left by earlier work, so a count captured as
    a baseline can shrink underneath the comparison (VERDICT r13
    item 1 — the race that turned the driver's VERIFY red)."""
    return {int(k) for k in sc._jsc.getPersistentRDDs().keys()}


def release_local_checkpoint(df: DataFrame) -> None:
    """Free the storage blocks behind a ``localCheckpoint()``ed frame.

    Iterative trainers (``bpe_train``, ``wordpiece_train``) truncate
    lineage with a local checkpoint every round, but Spark offers no
    DataFrame-level release for them — without one, each superseded
    round's blocks stay pinned in executor storage until session end,
    growing linearly with the round count (ADVICE r8: material at
    30k-merge production vocabularies).  A local checkpoint's analyzed
    plan is a ``LogicalRDD`` over the checkpointed RDD; unpersist that
    RDD non-blocking.  ONLY call after a successor checkpoint has
    MATERIALIZED (eager ``localCheckpoint()`` does): a locally-
    checkpointed RDD's lineage is truncated, so its blocks cannot be
    recomputed.  No-op on frames that are not local checkpoints."""
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:  # session stopped / plan shape changed — nothing to free
        pass
