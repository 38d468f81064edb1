"""Structured timing spans.

The reference's observability is printf'd wall-clock around three code
regions (reference: solve.cc:585-641) and tqdm progress.  This module
gives every pipeline stage a named span; collected spans serialize to the
JSON stats the drivers emit.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List


class Spans:
    def __init__(self):
        self._spans: List[Dict] = []
        self._stack: List[str] = []

    @contextlib.contextmanager
    def span(self, name: str):
        path = "/".join(self._stack + [name])
        self._stack.append(name)
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self._stack.pop()
            self._spans.append({"span": path, "ms": round(dt * 1000.0, 3)})

    def report(self) -> List[Dict]:
        return list(self._spans)

    def total_ms(self, prefix: str = "") -> float:
        return sum(s["ms"] for s in self._spans if s["span"].startswith(prefix))


class Accum:
    """Accumulating named sub-spans (total seconds + call counts) for
    attributing time WITHIN one pipeline stage — e.g. how the match-graph
    stage's wall-clock splits across host decode, matcher syncs, CNN
    batches, and proto emission.  Spans here are blocking-time meters on
    an asynchronous pipeline: they sum what the driving thread spent in
    each activity, so they add up to (at most) the stage wall-clock."""

    def __init__(self):
        self.totals: Dict[str, float] = {}
        self.calls: Dict[str, int] = {}

    @contextlib.contextmanager
    def span(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.calls[name] = self.calls.get(name, 0) + 1

    def add(self, name: str, seconds: float) -> None:
        self.totals[name] = self.totals.get(name, 0.0) + seconds
        self.calls[name] = self.calls.get(name, 0) + 1

    def report(self) -> Dict[str, Dict]:
        return {
            k: {"total_s": round(v, 3), "calls": self.calls[k]}
            for k, v in sorted(self.totals.items(), key=lambda kv: -kv[1])
        }


class CompileMeter:
    """Cumulative XLA backend-compile seconds via jax monitoring events.

    Attributes stage-time tails to compilation: a stage's wall-clock minus
    its compile delta is the reproducible warm cost (cold first-repeat
    outliers in the e2e benchmarks are otherwise unattributable — the
    probes show healthy links while a stage runs 3x its warm time)."""

    _registered = False
    _total = 0.0

    @classmethod
    def _ensure(cls) -> None:
        if cls._registered:
            return
        from jax._src import monitoring

        def _listener(name: str, dur: float, **kw) -> None:
            if name == "/jax/core/compile/backend_compile_duration":
                cls._total += dur

        monitoring.register_event_duration_secs_listener(_listener)
        cls._registered = True

    @classmethod
    def seconds(cls) -> float:
        """Cumulative backend-compile seconds so far in this process."""
        cls._ensure()
        return cls._total


#: Process-wide default collector (pipelines use it unless given their own).
default_spans = Spans()


def span(name: str):
    return default_spans.span(name)
