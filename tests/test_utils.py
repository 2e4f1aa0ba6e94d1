"""Utility-layer tests: mesh helpers, profiling counters, platform knob."""

import os
import time

import jax
import numpy as np
import pytest

from multimodal_timesfm_tpu.parallel.mesh import (
    MeshConfig,
    batch_sharding,
    make_mesh,
    pad_to_multiple,
    replicated,
    resolve_platform,
    shard_batch,
)
from multimodal_timesfm_tpu.utils.profiling import Throughput


def test_make_mesh_shapes_and_errors():
    mesh = make_mesh(MeshConfig(data_parallel=-1, model_parallel=2))
    assert dict(mesh.shape) == {"data": 4, "model": 2}
    with pytest.raises(ValueError, match="does not match"):
        make_mesh(MeshConfig(data_parallel=3, model_parallel=2))


def test_pad_to_multiple():
    assert pad_to_multiple(7, 4) == 8
    assert pad_to_multiple(8, 4) == 8
    assert pad_to_multiple(1, 8) == 8


def test_shard_batch_places_on_data_axis():
    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    tree = {"x": np.ones((16, 4), np.float32)}
    placed = shard_batch(mesh, tree)
    assert placed["x"].sharding == batch_sharding(mesh)
    assert replicated(mesh).is_fully_replicated


def test_resolve_platform():
    assert resolve_platform("tpu") == "tpu"
    assert resolve_platform() == jax.devices()[0].platform


def test_throughput_counters():
    t = Throughput()
    t.start()
    time.sleep(0.01)
    elapsed = t.stop(items=100)
    assert elapsed >= 0.01
    assert t.steps == 1 and t.total_items == 100
    assert t.items_per_sec > 0
    assert t.mean_step_seconds == pytest.approx(t.total_seconds)


def test_apply_platform_env(monkeypatch):
    from multimodal_timesfm_tpu.utils.platform import apply_platform_env

    monkeypatch.setenv("MTT_PLATFORM", "cpu")
    apply_platform_env()  # idempotent on an already-cpu test session
    assert jax.devices()[0].platform == "cpu"
    # JAX_PLATFORMS alone must ALSO pin via jax.config (env-only pinning
    # does not stop sitecustomize-registered plugins from initializing and
    # hanging when their backend is unreachable); MTT_PLATFORM wins; with
    # NEITHER set the function must not touch jax.config at all.
    monkeypatch.delenv("MTT_PLATFORM")
    seen = []
    monkeypatch.setattr(jax.config, "update", lambda k, v: seen.append((k, v)))
    monkeypatch.delenv("JAX_PLATFORMS", raising=False)
    apply_platform_env()
    assert seen == []  # the true no-op branch (conftest normally sets JAX_PLATFORMS)
    monkeypatch.setenv("JAX_PLATFORMS", "cpu")
    apply_platform_env()
    monkeypatch.setenv("MTT_PLATFORM", "tpu")
    apply_platform_env()
    assert seen == [("jax_platforms", "cpu"), ("jax_platforms", "tpu")]


def test_setup_logger_idempotent_and_file_additive(tmp_path):
    import logging

    from multimodal_timesfm_tpu.utils.logging import get_logger, setup_logger

    logger = setup_logger("mmfm_test_logger")
    n_handlers = len(logger.handlers)
    assert setup_logger("mmfm_test_logger") is logger
    assert len(logger.handlers) == n_handlers  # no duplicate stream handlers

    log_file = tmp_path / "logs" / "run.log"
    setup_logger("mmfm_test_logger", log_file=log_file)
    setup_logger("mmfm_test_logger", log_file=log_file)  # same file attaches once
    file_handlers = [h for h in logger.handlers if isinstance(h, logging.FileHandler)]
    assert len(file_handlers) == 1
    logger.info("hello file")
    file_handlers[0].flush()
    assert "hello file" in log_file.read_text()

    child = get_logger("unit")
    assert child.name == "multimodal_timesfm_tpu.unit"
    assert get_logger().name == "multimodal_timesfm_tpu"


def test_summarize_trace_aggregates_device_ops(tmp_path):
    import gzip
    import json

    from multimodal_timesfm_tpu.utils.profiling import summarize_trace

    events = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name", "args": {"name": "XLA Ops"}},
        {"ph": "M", "pid": 9, "name": "process_name", "args": {"name": "/host:CPU"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "while.1", "ts": 0, "dur": 5000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.7", "ts": 0, "dur": 3000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "fusion.7", "ts": 4000, "dur": 1000},
        {"ph": "X", "pid": 3, "tid": 1, "name": "copy.2", "ts": 0, "dur": 1000},
        {"ph": "X", "pid": 9, "tid": 5, "name": "python", "ts": 0, "dur": 2000},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    s = summarize_trace(tmp_path)
    # while-wrapper spans are excluded: their children are counted already.
    assert s["device_busy_ms"] == 5.0
    assert s["host_ms"] == 2.0
    top = dict((n, ms) for n, ms, _ in s["top_ops"])
    assert top == {"fusion.7": 4.0, "copy.2": 1.0}  # while excluded


def test_gemm_efficiency_reads_model_flops(tmp_path):
    import gzip
    import json

    from multimodal_timesfm_tpu.utils.profiling import gemm_efficiency

    # Two GEMM calls of 1 GF each over 20 us total on a 100 GF/s "peak"
    # => sustained 2 GF / 20 us = 100 TF/s ... scale peak so eff lands at 0.5.
    events = [
        {"ph": "M", "pid": 3, "name": "process_name", "args": {"name": "/device:TPU:0"}},
        {"ph": "M", "pid": 3, "tid": 1, "name": "thread_name", "args": {"name": "XLA Ops"}},
        {"ph": "X", "pid": 3, "tid": 1, "name": "while.1", "ts": 0, "dur": 9000},
        {
            "ph": "X", "pid": 3, "tid": 1, "name": "fusion.7", "ts": 0, "dur": 10,
            "args": {"model_flops": 1e9},
        },
        {
            "ph": "X", "pid": 3, "tid": 1, "name": "fusion.7", "ts": 40, "dur": 10,
            "args": {"model_flops": 1e9},
        },
        {"ph": "X", "pid": 3, "tid": 1, "name": "copy.2", "ts": 0, "dur": 30},
    ]
    d = tmp_path / "plugins" / "profile" / "run1"
    d.mkdir(parents=True)
    with gzip.open(d / "vm.trace.json.gz", "wt") as f:
        json.dump({"traceEvents": events}, f)

    # sustained = 2 GF / 20 us = 1e14 FLOP/s; peak 2e14 => weighted_eff 0.5
    s = gemm_efficiency(tmp_path, peak_flops=2e14)
    assert s["weighted_eff"] == 0.5
    assert s["flop_ms"] == 0.02
    assert s["non_flop_ms"] == 0.03  # copy.2; while wrapper excluded
    (op, calls, ms, gf, frac) = s["top_gemms"][0]
    assert (op, calls, gf) == ("fusion.7", 2, 1.0)
    assert frac == 0.5


def test_summarize_trace_missing_raises(tmp_path):
    import pytest

    from multimodal_timesfm_tpu.utils.profiling import summarize_trace

    with pytest.raises(FileNotFoundError):
        summarize_trace(tmp_path)


def test_concat_dataset_negative_underflow_raises():
    """Out-of-range negative indices raise (torch parity) instead of silently
    serving the first dataset's last element (review finding)."""
    import pytest

    from multimodal_timesfm_tpu.data.dataset import ConcatDataset

    ds = ConcatDataset([[0, 1, 2], [3, 4]])
    assert ds[-1] == 4 and ds[-5] == 0  # valid negatives wrap
    with pytest.raises(IndexError):
        ds[-6]
    with pytest.raises(IndexError):
        ds[5]
