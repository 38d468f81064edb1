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


#: Process-wide default collector (pipelines use it unless given their own).
default_spans = Spans()


def span(name: str):
    return default_spans.span(name)
