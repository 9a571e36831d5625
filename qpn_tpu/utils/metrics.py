"""First-class observability counters.

The reference has no tracing/profiling at all (SURVEY.md §5) — only @debug
piece-count strings.  Here every phase of the solver bumps named counters
(pieces expanded, LPs batched, AVI Newton iterations, vertices explored, ...)
so benchmarks and regressions are measurable.  ``METRICS`` is a process-global
registry; ``solve`` attaches a fresh scope per call.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict


class Metrics:
    """Counter updates are lock-guarded: under the lockstep ensemble
    driver many scenario threads bump the shared registry concurrently,
    and an unguarded ``+=`` on the defaultdict drops updates."""

    def __init__(self):
        self.counters: Dict[str, float] = defaultdict(float)
        self.timers: Dict[str, float] = defaultdict(float)
        self._lock = threading.Lock()

    def bump(self, name: str, amount: float = 1.0) -> None:
        with self._lock:
            self.counters[name] += amount

    @contextlib.contextmanager
    def timer(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.timers[name] += dt

    def reset(self) -> None:
        with self._lock:
            self.counters.clear()
            self.timers.clear()

    def snapshot(self) -> Dict[str, float]:
        out = dict(self.counters)
        out.update({f"time/{k}": v for k, v in self.timers.items()})
        return out

    def __repr__(self):
        items = ", ".join(f"{k}={v:g}" for k, v in sorted(self.snapshot().items()))
        return f"Metrics({items})"


METRICS = Metrics()
