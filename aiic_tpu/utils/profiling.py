"""Lightweight per-stage timing + optional jax.profiler traces.

The reference has no tracing at all (SURVEY.md §5a); this provides the
images/sec, per-stage wall time, and device-trace hooks a serving deployment
needs.
"""

from __future__ import annotations

import contextlib
import threading
import time
from collections import defaultdict
from typing import Dict, Optional


class StageTimer:
    """Thread-safe: serving handler threads record stages concurrently with
    GET /metrics snapshots (an unguarded dict would raise 'dictionary
    changed size during iteration' and lose '+=' updates)."""

    def __init__(self):
        self._lock = threading.Lock()
        self.totals: Dict[str, float] = defaultdict(float)
        self.counts: Dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            dt = time.perf_counter() - t0
            with self._lock:
                self.totals[name] += dt
                self.counts[name] += 1

    def summary(self) -> Dict[str, Dict[str, float]]:
        with self._lock:
            return {
                k: {"total_s": self.totals[k], "count": self.counts[k],
                    "mean_ms": 1e3 * self.totals[k] / max(self.counts[k], 1)}
                for k in self.totals
            }


@contextlib.contextmanager
def device_trace(logdir: Optional[str]):
    """jax.profiler trace context; no-op when logdir is None."""
    if not logdir:
        yield
        return
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
