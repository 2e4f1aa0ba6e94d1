"""Profiling and step-timing utilities.

The reference has no tracing/profiling at all (SURVEY.md §5). Here:
``trace()`` wraps a block in a ``jax.profiler`` trace (viewable in
TensorBoard/XProf/Perfetto), and ``Throughput`` keeps simple step-time /
series-per-second counters — the north-star metric bench.py reports.
"""

from __future__ import annotations

from typing import Any

import contextlib
import time
from dataclasses import dataclass, field
from pathlib import Path

import jax


@contextlib.contextmanager
def trace(log_dir: str | Path, enabled: bool = True) -> Any:
    """Profile the enclosed block to ``log_dir`` (no-op when disabled)."""
    if not enabled:
        yield
        return
    jax.profiler.start_trace(str(log_dir))
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def summarize_trace(log_dir: str | Path, top: int = 20) -> dict:
    """Summarize the newest ``jax.profiler`` trace under ``log_dir``.

    Offline-friendly alternative to TensorBoard (unavailable in air-gapped
    deployments): parses the Chrome-trace export and aggregates device-op
    durations, so kernel-level hotspots are inspectable from the terminal.

    Returns:
        dict with ``device_busy_ms``, ``host_ms``, ``trace_file``, and
        ``top_ops`` — a list of ``(op_name, total_ms, share_of_device)``,
        most expensive first. ``while`` loop wrapper spans are excluded from
        BOTH the busy total and the top list — their children are already
        counted individually, so including the wrappers would double-count
        every op that runs inside a ``lax.scan``. ``host_ms`` sums spans
        across host threads (overlaps included) — a rough activity number,
        not wall time.
    """
    import collections
    import gzip
    import json

    traces = sorted(Path(log_dir).rglob("*.trace.json.gz"))
    if not traces:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    trace_file = traces[-1]
    with gzip.open(trace_file) as f:
        events = json.load(f).get("traceEvents", [])

    pids: dict = {}
    tids: dict = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")

    device_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n or "device" in n.lower()}
    ops: collections.Counter = collections.Counter()
    device_busy = 0.0
    host = 0.0
    for e in events:
        if e.get("ph") != "X":
            continue
        dur = e.get("dur", 0)
        if e["pid"] in device_pids:
            if tids.get((e["pid"], e.get("tid"))) == "XLA Ops" and not e["name"].startswith(
                "while"
            ):
                device_busy += dur
                ops[e["name"]] += dur
        else:
            host += dur

    total_op = sum(ops.values()) or 1.0
    return {
        "trace_file": str(trace_file),
        "device_busy_ms": round(device_busy / 1e3, 2),
        "host_ms": round(host / 1e3, 2),
        "top_ops": [
            (name, round(dur / 1e3, 3), round(dur / total_op, 4))
            for name, dur in ops.most_common(top)
        ],
    }


def gemm_efficiency(log_dir: str | Path, peak_flops: float = 197e12, top: int = 12) -> dict:
    """Per-GEMM sustained efficiency vs peak, read from the newest trace.

    The roofline method (docs/PERF.md, scripts/roofline.py) needs each
    workload's OWN measured GEMM efficiency, not a borrowed default: XLA Ops
    trace events carry ``model_flops`` in their args, so sustained FLOP/s per
    op is ``model_flops x occurrences / total_duration``. Ops without
    ``model_flops`` (copies, reduces, layout ops) are reported separately as
    ``non_flop_ms`` — they are the traffic terms the roofline accounts via
    bytes, not compute.

    Returns dict with ``flop_ms``/``non_flop_ms``, ``weighted_eff`` (the
    duration-weighted fraction-of-peak across all FLOP-carrying ops — the
    value to pass to ``scripts/roofline.py --eff``), and ``top_gemms``:
    ``(op, calls, total_ms, gflop_per_call, frac_of_peak)``.
    """
    import collections
    import gzip
    import json

    traces = sorted(Path(log_dir).rglob("*.trace.json.gz"))
    if not traces:
        raise FileNotFoundError(f"no *.trace.json.gz under {log_dir}")
    with gzip.open(traces[-1]) as f:
        events = json.load(f).get("traceEvents", [])

    pids: dict = {}
    tids: dict = {}
    for e in events:
        if e.get("ph") == "M":
            if e.get("name") == "process_name":
                pids[e["pid"]] = e["args"].get("name", "")
            elif e.get("name") == "thread_name":
                tids[(e["pid"], e.get("tid"))] = e["args"].get("name", "")
    device_pids = {p for p, n in pids.items() if "TPU" in n or "GPU" in n or "device" in n.lower()}

    dur_us: collections.Counter = collections.Counter()
    calls: collections.Counter = collections.Counter()
    flops_per_call: dict = {}
    for e in events:
        if e.get("ph") != "X" or e["pid"] not in device_pids:
            continue
        if tids.get((e["pid"], e.get("tid"))) != "XLA Ops" or e["name"].startswith("while"):
            continue
        dur_us[e["name"]] += e.get("dur", 0)
        calls[e["name"]] += 1
        mf = (e.get("args") or {}).get("model_flops")
        if mf is not None:
            try:
                flops_per_call[e["name"]] = float(mf)
            except (TypeError, ValueError):
                pass

    flop_us = 0.0
    flop_total = 0.0
    rows = []
    for name, us in dur_us.items():
        f = flops_per_call.get(name, 0.0)
        if f <= 0 or us <= 0:
            continue
        flop_us += us
        total_f = f * calls[name]
        flop_total += total_f
        rows.append((name, calls[name], us / 1e3, f / 1e9, (total_f / (us * 1e-6)) / peak_flops))
    rows.sort(key=lambda r: -r[2])
    non_flop_us = sum(dur_us.values()) - flop_us
    weighted_eff = (flop_total / (flop_us * 1e-6)) / peak_flops if flop_us else 0.0
    return {
        "trace_file": str(traces[-1]),
        "flop_ms": round(flop_us / 1e3, 2),
        "non_flop_ms": round(non_flop_us / 1e3, 2),
        "weighted_eff": round(weighted_eff, 4),
        "top_gemms": [
            (n, c, round(ms, 3), round(gf, 3), round(eff, 3)) for n, c, ms, gf, eff in rows[:top]
        ],
    }


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
