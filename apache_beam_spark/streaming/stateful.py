"""User state + timers on unbounded input.

Reference: stateful ParDo — ``@StateId`` ValueState/BagState/SetState/
MapState/CombiningState (``state/StateSpecs.java:49-182``) and
``@TimerId`` event/processing-time timers (``state/TimerSpecs.java:28``),
run by ``StatefulDoFnRunner.java:46``.

Spark realization: ``applyInPandasWithState`` — the state struct holds
what the reference split across named state cells (a ValueState is a
scalar field, a BagState an array field, a MapState a map field), and
``GroupState`` timeouts play the timer role (one timeout per key; the
reference's multiple named timers multiplex through a (timer_id,
fire_at) heap kept IN the state struct, firing every due entry whenever
the single Spark timeout wakes the key).
"""

from __future__ import annotations

from typing import Callable, Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def stateful_per_key(
    df: DataFrame,
    keys: list[str],
    func: Callable,
    output_schema,
    state_schema,
    timeout: str = "NoTimeout",
) -> DataFrame:
    """Stateful ParDo (reference ParDo.of(stateful DoFn),
    ``transforms/ParDo.java:432`` + StateSpecs).

    ``func(key, pdf_iter, state) -> Iterable[pd.DataFrame]`` — the
    reference's ``@ProcessElement`` with a state argument; bundle
    semantics (@StartBundle/@FinishBundle) map to the per-group pandas
    iterator.  ``timeout``: NoTimeout | ProcessingTimeTimeout |
    EventTimeTimeout (reference TimeDomain.java).
    """
    to = getattr(GroupStateTimeout, timeout)
    return df.groupBy(*keys).applyInPandasWithState(
        func, outputStructType=output_schema, stateStructType=state_schema,
        outputMode="append", timeoutConf=to,
    )


def group_into_batches_stream(
    df: DataFrame,
    key: str,
    batch_size: int,
    value_cols: list[str],
    flush_after_ms: Optional[int] = None,
) -> DataFrame:
    """Streaming GroupIntoBatches (reference
    ``transforms/GroupIntoBatches.java:79`` — BagState buffer + ValueState
    count + an expiry timer).

    Emits rows ``(key, batch array<struct>, batch_size)`` whenever a
    key's buffer reaches ``batch_size``; a processing-time timeout
    flushes stragglers (the reference's end-of-window timer).
    """
    from pyspark.sql import functions as F  # noqa: F401  (schema strings below)

    out_schema = (
        f"{key} string, batch array<string>, n int"
    )
    state_schema = "buf array<string>"

    def fn(k, pdfs: Iterable[pd.DataFrame], state: GroupState):
        (buf,) = state.get if state.exists else ([],)
        buf = list(buf)
        emitted = []
        if state.hasTimedOut:
            if buf:
                emitted.append(buf)
                buf = []
        else:
            for pdf in pdfs:
                for v in pdf[value_cols[0]].astype(str):
                    buf.append(v)
                    if len(buf) >= batch_size:
                        emitted.append(buf)
                        buf = []
        if buf:
            state.update((buf,))
            if flush_after_ms is not None:
                state.setTimeoutDuration(flush_after_ms)
        elif state.exists:
            state.remove()
        for b in emitted:
            yield pd.DataFrame({key: [k[0]], "batch": [b], "n": [len(b)]})

    timeout = "ProcessingTimeTimeout" if flush_after_ms is not None else "NoTimeout"
    return stateful_per_key(
        df.select(key, *value_cols), [key], fn, out_schema, state_schema, timeout
    )


def streaming_distinct(df: DataFrame, cols: list[str], event_time: str,
                       within: str) -> DataFrame:
    """Streaming Distinct (reference ``transforms/Distinct.java`` on an
    unbounded input): state-backed dedup whose per-key state is evicted
    once the watermark passes ``within`` — the reference gets the same
    GC from window-expiry of the GroupByKey state."""
    from apache_beam_spark.windowing import ensure_event_time

    return (ensure_event_time(df, event_time)
            .withWatermark(event_time, within)
            .dropDuplicatesWithinWatermark(cols))
