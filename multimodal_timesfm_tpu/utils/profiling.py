"""Profiling and step-timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5). Here:
``trace()`` wraps a block in a ``jax.profiler`` trace (viewable in
TensorBoard/XProf/Perfetto), and ``Throughput`` keeps simple step-time /
series-per-second counters — the north-star metric bench.py reports.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True):
    """Profile the enclosed block to ``log_dir`` (no-op when disabled)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclass
class Throughput:
    """Running step-time and items/sec counters."""

    total_items: int = 0
    total_seconds: float = 0.0
    steps: int = 0
    _t0: float = field(default=0.0, repr=False)

    def start(self) -> None:
        self._t0 = time.perf_counter()

    def stop(self, items: int) -> float:
        """Record one timed step; returns its duration in seconds."""
        elapsed = time.perf_counter() - self._t0
        self.total_items += items
        self.total_seconds += elapsed
        self.steps += 1
        return elapsed

    @property
    def items_per_sec(self) -> float:
        return self.total_items / self.total_seconds if self.total_seconds else 0.0

    @property
    def mean_step_seconds(self) -> float:
        return self.total_seconds / self.steps if self.steps else 0.0
