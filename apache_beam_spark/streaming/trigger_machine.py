"""Composite trigger state machines (VERDICT r1 item 5).

Reference semantics: ``runners/core-java/.../triggers/*StateMachine.java``
and ``sdks/java/core/.../transforms/windowing/`` — ``Repeatedly.java:37``,
``OrFinallyTrigger.java:31``, ``AfterEach.java:45``, ``AfterFirst.java:33``,
``AfterAll.java:32``, ``Never.java:32``, ``AfterWatermark.java``,
``AfterPane.java``, ``AfterProcessingTime.java``.

Each trigger is a pure state machine over a JSON-serializable dict, so
the same machine runs in the transcript test harness AND inside an
``applyInPandasWithState`` operator (state round-trips through the
stateful layer's JSON encoding).  The runner (``run_transcript`` /
``triggered_windowed_sum`` in triggers.py) owns the pane lifecycle:
elements accumulate into the current pane, ``should_fire`` emits it,
``finished`` closes the window and drops later input.

Pane timing follows ``PaneInfo.Timing``: EARLY while the watermark is
before the window end, the first at-or-after fire is ON_TIME, anything
later is LATE.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Sequence


@dataclass(frozen=True)
class TriggerContext:
    """What a trigger may consult when deciding to fire."""

    watermark_ms: int
    ptime_ms: int
    window_end_ms: int


class TriggerSM:
    """Base trigger state machine.  State is a plain dict (JSON-safe);
    instances are immutable specs shared across keys/windows."""

    def new_state(self) -> dict:
        return {}

    def on_element(self, s: dict, ctx: TriggerContext) -> None:
        pass

    def should_fire(self, s: dict, ctx: TriggerContext) -> bool:
        raise NotImplementedError

    def on_fire(self, s: dict, ctx: TriggerContext) -> None:
        """Post-fire bookkeeping; sets ``s['_done']`` when the trigger
        finishes (reference: a finished trigger closes the window)."""
        s["_done"] = True

    def finished(self, s: dict) -> bool:
        return bool(s.get("_done"))

    # -- fluent sugar mirroring the reference API ----------------------
    def or_finally(self, until: "TriggerSM") -> "OrFinally":
        return OrFinally(self, until)


class AfterPane(TriggerSM):
    """AfterPane.elementCountAtLeast(n) (AfterPane.java:48)."""

    def __init__(self, count: int):
        self.count = count

    def new_state(self) -> dict:
        return {"n": 0}

    def on_element(self, s, ctx) -> None:
        s["n"] = s.get("n", 0) + 1

    def should_fire(self, s, ctx) -> bool:
        return s.get("n", 0) >= self.count


class AfterWatermark(TriggerSM):
    """AfterWatermark.pastEndOfWindow() (AfterWatermark.java:109),
    optionally withEarlyFirings/withLateFirings (:131,:122).

    Early firings behave as Repeatedly(early) while the watermark is
    before the window end; the pass of the watermark fires the ON_TIME
    pane unconditionally; late firings behave as Repeatedly(late)
    afterwards (without them, the trigger finishes at the on-time
    pane)."""

    def __init__(self, early: Optional[TriggerSM] = None,
                 late: Optional[TriggerSM] = None):
        self.early = Repeatedly(early) if early else None
        self.late = Repeatedly(late) if late else None

    def with_early_firings(self, t: TriggerSM) -> "AfterWatermark":
        return AfterWatermark(early=t, late=self.late)

    def with_late_firings(self, t: TriggerSM) -> "AfterWatermark":
        return AfterWatermark(early=self.early.sub if self.early else None, late=t)

    def new_state(self) -> dict:
        s: dict = {"on_time_fired": False}
        if self.early:
            s["early"] = self.early.new_state()
        if self.late:
            s["late"] = self.late.new_state()
        return s

    def _past_end(self, ctx: TriggerContext) -> bool:
        return ctx.watermark_ms >= ctx.window_end_ms

    def on_element(self, s, ctx) -> None:
        if not s.get("on_time_fired"):
            if self.early and not self._past_end(ctx):
                self.early.on_element(s["early"], ctx)
        elif self.late:
            self.late.on_element(s["late"], ctx)

    def should_fire(self, s, ctx) -> bool:
        if not s.get("on_time_fired"):
            if self._past_end(ctx):
                return True  # the on-time pane
            return bool(self.early and self.early.should_fire(s["early"], ctx))
        return bool(self.late and self.late.should_fire(s["late"], ctx))

    def on_fire(self, s, ctx) -> None:
        if not s.get("on_time_fired"):
            if self._past_end(ctx):
                s["on_time_fired"] = True
                if not self.late:
                    s["_done"] = True
            else:
                self.early.on_fire(s["early"], ctx)
        else:
            self.late.on_fire(s["late"], ctx)


class Repeatedly(TriggerSM):
    """Repeatedly.forever(sub) (Repeatedly.java:37): when the
    sub-trigger fires and finishes it is reset and re-armed — the
    composite never finishes."""

    def __init__(self, sub: TriggerSM):
        self.sub = sub

    def new_state(self) -> dict:
        return {"sub": self.sub.new_state()}

    def on_element(self, s, ctx) -> None:
        self.sub.on_element(s["sub"], ctx)

    def should_fire(self, s, ctx) -> bool:
        return self.sub.should_fire(s["sub"], ctx)

    def on_fire(self, s, ctx) -> None:
        self.sub.on_fire(s["sub"], ctx)
        if self.sub.finished(s["sub"]):
            s["sub"] = self.sub.new_state()


class OrFinally(TriggerSM):
    """main.orFinally(until) (OrFinallyTrigger.java:31): behaves as
    ``main`` until ``until`` fires, which fires one final pane and
    finishes the window."""

    def __init__(self, main: TriggerSM, until: TriggerSM):
        self.main, self.until = main, until

    def new_state(self) -> dict:
        return {"main": self.main.new_state(), "until": self.until.new_state()}

    def on_element(self, s, ctx) -> None:
        self.main.on_element(s["main"], ctx)
        self.until.on_element(s["until"], ctx)

    def should_fire(self, s, ctx) -> bool:
        return (self.until.should_fire(s["until"], ctx)
                or self.main.should_fire(s["main"], ctx))

    def on_fire(self, s, ctx) -> None:
        if self.until.should_fire(s["until"], ctx):
            s["_done"] = True
            return
        self.main.on_fire(s["main"], ctx)
        if self.main.finished(s["main"]):
            s["_done"] = True


class AfterFirst(TriggerSM):
    """AfterFirst.of(a, b, ...) (AfterFirst.java:33): fires when ANY
    sub-trigger fires, then finishes (wrap in Repeatedly to repeat)."""

    def __init__(self, *subs: TriggerSM):
        self.subs = subs

    def new_state(self) -> dict:
        return {"subs": [t.new_state() for t in self.subs]}

    def on_element(self, s, ctx) -> None:
        for t, ts in zip(self.subs, s["subs"]):
            t.on_element(ts, ctx)

    def should_fire(self, s, ctx) -> bool:
        return any(t.should_fire(ts, ctx) for t, ts in zip(self.subs, s["subs"]))


class AfterAll(TriggerSM):
    """AfterAll.of(a, b, ...) (AfterAll.java:32): fires once ALL
    sub-triggers are satisfied, then finishes."""

    def __init__(self, *subs: TriggerSM):
        self.subs = subs

    def new_state(self) -> dict:
        return {"subs": [t.new_state() for t in self.subs],
                "sat": [False] * len(self.subs)}

    def _update(self, s, ctx) -> None:
        for i, (t, ts) in enumerate(zip(self.subs, s["subs"])):
            if not s["sat"][i] and t.should_fire(ts, ctx):
                s["sat"][i] = True

    def on_element(self, s, ctx) -> None:
        for i, (t, ts) in enumerate(zip(self.subs, s["subs"])):
            if not s["sat"][i]:
                t.on_element(ts, ctx)
        self._update(s, ctx)

    def should_fire(self, s, ctx) -> bool:
        self._update(s, ctx)
        return all(s["sat"])


class AfterEach(TriggerSM):
    """AfterEach.inOrder(a, b, ...) (AfterEach.java:45): runs each
    sub-trigger to completion in order; finishes after the last."""

    def __init__(self, *subs: TriggerSM):
        self.subs = subs

    def new_state(self) -> dict:
        return {"i": 0, "sub": self.subs[0].new_state()}

    def on_element(self, s, ctx) -> None:
        if s["i"] < len(self.subs):
            self.subs[s["i"]].on_element(s["sub"], ctx)

    def should_fire(self, s, ctx) -> bool:
        return (s["i"] < len(self.subs)
                and self.subs[s["i"]].should_fire(s["sub"], ctx))

    def on_fire(self, s, ctx) -> None:
        t = self.subs[s["i"]]
        t.on_fire(s["sub"], ctx)
        if t.finished(s["sub"]):  # non-repeating subs finish on fire
            s["i"] += 1
            if s["i"] < len(self.subs):
                s["sub"] = self.subs[s["i"]].new_state()
            else:
                s["_done"] = True


class Never(TriggerSM):
    """Never.ever() (Never.java:32): only the runner's final pane (if
    any) — the trigger itself never fires and never finishes."""

    def should_fire(self, s, ctx) -> bool:
        return False


class AfterProcessingTime(TriggerSM):
    """AfterProcessingTime.pastFirstElementInPane().plusDelayOf(d)
    (AfterProcessingTime.java:49): fires ``delay_ms`` of processing
    time after the first element of the pane."""

    def __init__(self, delay_ms: int):
        self.delay_ms = delay_ms

    def new_state(self) -> dict:
        return {"target": None}

    def on_element(self, s, ctx) -> None:
        if s.get("target") is None:
            s["target"] = ctx.ptime_ms + self.delay_ms

    def should_fire(self, s, ctx) -> bool:
        return s.get("target") is not None and ctx.ptime_ms >= s["target"]


# ---------------------------------------------------------------------
# transcript harness

EARLY, ON_TIME, LATE = "EARLY", "ON_TIME", "LATE"


def run_transcript(trigger: TriggerSM, window_end_ms: int,
                   events: Sequence[tuple], accumulating: bool = True) -> dict:
    """Drive a trigger over a transcript of events for one (key, window).

    ``events``: ``("element", value)`` | ``("watermark", ms)`` |
    ``("ptime", ms)``.  Returns ``{"panes": [...], "dropped": [...]}``
    where each pane is ``{"index", "timing", "values"}`` — values are
    the running accumulation (ACCUMULATING_FIRED_PANES) or just the
    pane's novelty (DISCARDING), per Window.java:261,273.
    """
    s = trigger.new_state()
    watermark, ptime = -1, 0
    pane_values: list = []
    all_values: list = []
    panes: list[dict] = []
    dropped: list = []
    on_time_seen = False

    def ctx() -> TriggerContext:
        return TriggerContext(watermark, ptime, window_end_ms)

    def maybe_fire() -> None:
        # at most one firing per transcript event — the reference fires
        # per bundle, and unbounded refiring (e.g. Repeatedly(After-
        # Watermark) past the end) must not spin
        nonlocal pane_values, on_time_seen
        if trigger.finished(s) or not trigger.should_fire(s, ctx()):
            return
        if watermark >= window_end_ms and not on_time_seen:
            timing = ON_TIME
            on_time_seen = True
        elif watermark >= window_end_ms:
            timing = LATE
        else:
            timing = EARLY
        panes.append({
            "index": len(panes), "timing": timing,
            "values": list(all_values if accumulating else pane_values),
        })
        pane_values = []
        trigger.on_fire(s, ctx())

    for ev in events:
        kind, arg = ev
        if trigger.finished(s):
            if kind == "element":
                dropped.append(arg)
            continue
        if kind == "element":
            pane_values.append(arg)
            all_values.append(arg)
            trigger.on_element(s, ctx())
        elif kind == "watermark":
            # watermarks are monotone (WatermarkManager semantics): a
            # regressing update is ignored, never applied
            watermark = max(watermark, arg)
        elif kind == "ptime":
            ptime = arg
        else:
            raise ValueError(f"unknown transcript event {kind!r}")
        maybe_fire()
    return {"panes": panes, "dropped": dropped,
            "closed": trigger.finished(s)}
