"""Multiple named timers per key, multiplexed over Spark's single
GroupState timeout.

Reference: a DoFn may declare several ``@TimerId``s with independent
fire times (``state/TimerSpecs.java:28``, ``DoFn.java:458,477``), in
either time domain (``TimeDomain.java``).  Spark's ``GroupState`` has
exactly ONE timeout per key — so named timers live in a (timer_id,
fire_at_ms) heap INSIDE the state struct, the real timeout is always set
to the heap minimum, and every wake-up fires all due entries in
fire-time order (SURVEY.md §2.9 / §7 "genuinely hard" tier).

State encoding: ``(user_json string, timers array<string>)`` — user
state round-trips through JSON (schema-free v1; a hot-path operator
should declare a typed struct instead), each timer entry is
``"<fire_at_ms>:<timer_id>"`` so lexicographic array sorting is also
fire-time ordering for fixed-width ms.
"""

from __future__ import annotations

import json
from typing import Callable, Iterable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

_STATE_SCHEMA = "user_json string, timers array<string>"


class StatefulContext:
    """What the user fn sees: named state + named timers (the reference
    DoFn's ``@StateId``/``@TimerId`` surface, minus annotations)."""

    def __init__(self, user: dict, timers: list[str]):
        self._user = user
        self._timers = timers
        self.emitted: list[dict] = []
        #: current watermark (event domain) / wall clock (processing
        #: domain) in ms — set by the runner before process/on_timer
        self.now_ms: int = 0

    # -- state cells (ValueState/BagState/... by convention of value type)
    def get(self, state_id: str, default=None):
        return self._user.get(state_id, default)

    def put(self, state_id: str, value) -> None:
        self._user[state_id] = value

    def clear(self, state_id: str) -> None:
        self._user.pop(state_id, None)

    def clear_all(self) -> None:
        """Drop every state cell AND every pending timer — the
        window-expiry GC the reference runs per (key, window) when the
        watermark passes the window's end plus allowed lateness
        (``ReduceFnRunner.onGarbageCollection``).  With nothing left,
        the runner removes the underlying GroupState entirely, so
        expired windows cost zero long-term state."""
        self._user.clear()
        self._timers.clear()

    # -- named timers --------------------------------------------------
    def set_timer(self, timer_id: str, fire_at_ms: int) -> None:
        """reference DoFn @TimerId set() — overwrites same-id timer."""
        self.clear_timer(timer_id)
        self._timers.append(f"{fire_at_ms:020d}:{timer_id}")
        self._timers.sort()

    def clear_timer(self, timer_id: str) -> None:
        self._timers[:] = [t for t in self._timers if t.split(":", 1)[1] != timer_id]

    def _due(self, now_ms: int) -> list[tuple[int, str]]:
        due = [(int(t.split(":", 1)[0]), t.split(":", 1)[1])
               for t in self._timers if int(t.split(":", 1)[0]) <= now_ms]
        self._timers[:] = [t for t in self._timers if int(t.split(":", 1)[0]) > now_ms]
        return due

    def _next_fire(self) -> Optional[int]:
        return int(self._timers[0].split(":", 1)[0]) if self._timers else None

    def output(self, row: dict) -> None:
        self.emitted.append(row)


def stateful_do_fn(
    df: DataFrame,
    keys: list[str],
    process: Callable[[tuple, pd.DataFrame, StatefulContext], None],
    on_timer: Callable[[tuple, str, StatefulContext], None],
    output_schema: str,
    time_domain: str = "event",
    event_time: str = "ts",
    allowed_lateness: str = "0 seconds",
    sort_within_batch: Optional[list[str]] = None,
) -> DataFrame:
    """Stateful ParDo with multiple named timers.

    ``process(key, pdf, ctx)`` handles a micro-batch of one key's rows;
    ``on_timer(key, timer_id, ctx)`` fires per due named timer.  Both
    emit via ``ctx.output(dict)``.  ``time_domain``: 'event' (timers
    measured against the watermark — requires ``event_time``/watermark),
    'processing' (wall clock — NOTE: the query then keeps triggering
    timeout-check micro-batches even without data, so
    processAllAvailable-style harnesses won't drain), or 'none'
    (stateful but timer-less operators, e.g. count triggers).

    ``sort_within_batch``: column names to stably sort each key's
    micro-batch by before calling ``process`` (the Arrow chunks are
    concatenated first, so the order is total per batch).  Order-
    sensitive operators (count triggers) use this to pin a
    deterministic element order for replay testing — the reference
    likewise has no intra-bundle order guarantee, so any stable order
    is a valid arrival order.  Costs one concat+sort per key/batch;
    ``None`` (default) streams the chunks through unchanged.
    """
    timeout = {"event": GroupStateTimeout.EventTimeTimeout,
               "processing": GroupStateTimeout.ProcessingTimeTimeout,
               "none": GroupStateTimeout.NoTimeout}[time_domain]
    if time_domain == "event" and df.isStreaming:
        from apache_beam_spark.windowing import ensure_event_time

        df = ensure_event_time(df, event_time).withWatermark(
            event_time, allowed_lateness)

    def fn(key, pdfs: Iterator[pd.DataFrame], state: GroupState) -> Iterator[pd.DataFrame]:
        user, timers = ({}, [])
        if state.exists:
            user_json, saved = state.get
            user = json.loads(user_json) if user_json else {}
            timers = list(saved or [])
        ctx = StatefulContext(user, timers)

        now_ms = (state.getCurrentWatermarkMs() if time_domain == "event"
                  else state.getCurrentProcessingTimeMs()
                  if time_domain == "processing" else 0)
        ctx.now_ms = now_ms

        if not state.hasTimedOut:
            if sort_within_batch is not None:
                chunks = [p for p in pdfs if len(p)]
                if chunks:
                    pdf = (pd.concat(chunks, ignore_index=True)
                           .sort_values(sort_within_batch, kind="mergesort")
                           .reset_index(drop=True))
                    process(key, pdf, ctx)
            else:
                for pdf in pdfs:
                    if len(pdf):
                        process(key, pdf, ctx)
        # fire every due named timer, in fire-time order — whether we
        # woke from the real timeout or from new data (the reference
        # fires timers on watermark advance regardless of input)
        for fire_at, timer_id in ctx._due(now_ms):
            on_timer(key, timer_id, ctx)

        nxt = ctx._next_fire()
        if ctx._user or ctx._timers:
            state.update((json.dumps(ctx._user), ctx._timers))
            if nxt is not None:
                if time_domain == "event":
                    state.setTimeoutTimestamp(max(nxt, now_ms + 1))
                elif time_domain == "processing":
                    state.setTimeoutDuration(max(nxt - now_ms, 1))
                else:
                    raise ValueError(
                        "set_timer() requires time_domain 'event' or 'processing'")
        elif state.exists:
            state.remove()

        if ctx.emitted:
            yield pd.DataFrame(ctx.emitted)

    return df.groupBy(*keys).applyInPandasWithState(
        fn, outputStructType=output_schema, stateStructType=_STATE_SCHEMA,
        outputMode="append", timeoutConf=timeout,
    )
