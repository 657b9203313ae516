"""Observability: per-stage timing, counters and device profiling.

The reference interleaves std::cout progress logging with compute
(src/sift.cpp:188-198,719-773).  Here observability is structured and
opt-in: a StageTimer collects wall/dispatch times per named stage, pipeline
stages are wrapped in jax.named_scope for device traces, and
``trace_to(dir)`` captures a Perfetto/XProf trace via jax.profiler.
"""

from __future__ import annotations

import contextlib
import json
import time
from collections import defaultdict

import jax


class StageTimer:
    """Accumulates wall-clock per named stage; supports nested scopes."""

    def __init__(self, sync: bool = False):
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)
        self.sync = sync

    @contextlib.contextmanager
    def stage(self, name: str, result=None):
        t0 = time.perf_counter()
        with jax.named_scope(name):
            yield
        if self.sync and result is not None:
            jax.block_until_ready(result)
        self.totals[name] += time.perf_counter() - t0
        self.counts[name] += 1

    def summary(self) -> dict:
        return {
            name: {
                "total_s": round(self.totals[name], 6),
                "calls": self.counts[name],
                "mean_ms": round(1e3 * self.totals[name] / self.counts[name], 3),
            }
            for name in sorted(self.totals)
        }

    def report(self) -> str:
        return json.dumps(self.summary(), indent=2)


@contextlib.contextmanager
def trace_to(log_dir: str):
    """Capture a device trace viewable in Perfetto / XProf."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Metrics:
    """Structured pipeline metrics (counts per stage, fps) as one JSON doc —
    the structured replacement for the reference's stdout counters."""

    def __init__(self):
        self.values: dict = {}

    def set(self, key: str, value):
        self.values[key] = value

    def to_json(self) -> str:
        return json.dumps(self.values, sort_keys=True)
