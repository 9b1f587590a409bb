"""Trigger emulation tier (SURVEY.md §2.8 / §7 "genuinely hard").

Mapping of the reference's trigger algebra onto Structured Streaming:

| Reference trigger                       | Here |
|-----------------------------------------|------|
| Default (AfterWatermark past end)       | append mode — exact |
| AfterWatermark.withEarlyFirings         | update mode (one early pane per micro-batch; no pane index) |
| AfterProcessingTime.plusDelayOf(d)      | ``trigger(processingTime=d)`` + update mode |
| AfterPane.elementCountAtLeast(n)        | ``count_trigger_aggregate`` below (stateful, real pane metadata) |
| Repeatedly / AfterEach / AfterFirst ... | not emulated — composite state machines documented as out of scope |

``count_trigger_aggregate`` also demonstrates ACCUMULATING_FIRED_PANES
(Window.java:273): each fired pane carries the running aggregate and a
``pane_index``, the metadata Spark's native aggregation has no slot for
(PaneInfo.java:44).
"""

from __future__ import annotations

from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame

from apache_beam_spark.streaming.timers import stateful_do_fn


def count_trigger_aggregate(
    df: DataFrame,
    key: str,
    value_col: str,
    fire_every: int,
    event_time: str = "ts",
    accumulating: bool = True,
) -> DataFrame:
    """AfterPane.elementCountAtLeast(fire_every) on a per-key sum.

    Emits a pane ``(key, pane_index, n_in_pane, total)`` every
    ``fire_every`` elements; ``accumulating=True`` makes ``total`` the
    running aggregate across panes (ACCUMULATING_FIRED_PANES),
    ``False`` resets per pane (DISCARDING_FIRED_PANES).
    """

    def process(k, pdf: pd.DataFrame, ctx) -> None:
        n = ctx.get("n", 0)
        total = ctx.get("total", 0.0)
        pane = ctx.get("pane", 0)
        pane_n = ctx.get("pane_n", 0)
        pane_total = ctx.get("pane_total", 0.0)
        for v in pdf[value_col]:
            n += 1
            pane_n += 1
            total += float(v)
            pane_total += float(v)
            if pane_n >= fire_every:
                ctx.output({
                    "key": k[0], "pane_index": pane, "n_in_pane": pane_n,
                    "total": total if accumulating else pane_total,
                })
                pane += 1
                pane_n = 0
                pane_total = 0.0
        ctx.put("n", n); ctx.put("total", total); ctx.put("pane", pane)
        ctx.put("pane_n", pane_n); ctx.put("pane_total", pane_total)

    def on_timer(k, timer_id, ctx) -> None:  # pragma: no cover - no timers set
        pass

    return stateful_do_fn(
        df.select(key, value_col, event_time).withColumnRenamed(key, "__k__"),
        ["__k__"], process, on_timer,
        output_schema="key string, pane_index int, n_in_pane int, total double",
        time_domain="none",
    )
