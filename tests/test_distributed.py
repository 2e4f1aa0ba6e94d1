"""Two-process distributed training test (multi-host DCN path, SURVEY.md §2.4).

Spawns two localhost worker processes that ``jax.distributed.initialize`` over
CPU (4 virtual devices each -> one 8-device global mesh, Gloo collectives) and
run one real ``MultimodalTrainer`` epoch. This executes ``put_global``'s
``make_array_from_process_local_data`` branch (``parallel/mesh.py``) — the one
code path a single-process virtual mesh cannot reach — and asserts loss parity
with a single-process run at the identical 8-device geometry.

Skips (rather than fails) when process spawning or the localhost rendezvous is
unavailable (sandboxed environments).
"""

import os
import re
import socket
import subprocess
import sys
from pathlib import Path

import pytest

_WORKER = Path(__file__).parent / "distributed_worker.py"


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _run_workers(num_processes: int, devices_per_proc: int, timeout: int = 600):
    """Launch the worker ``num_processes`` times; return per-process losses."""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={devices_per_proc}"
    repo = str(Path(__file__).resolve().parents[1])
    env["PYTHONPATH"] = repo + os.pathsep + env.get("PYTHONPATH", "")

    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, str(_WORKER), str(i), str(num_processes), str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(num_processes)
    ]
    outputs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=timeout)
            outputs.append((p.returncode, out))
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()

    losses = {}
    for code, out in outputs:
        if code != 0:
            if re.search(r"(barrier|UNAVAILABLE|DEADLINE|connect)", out, re.I):
                pytest.skip(f"localhost distributed rendezvous unavailable:\n{out[-2000:]}")
            raise AssertionError(f"worker failed (exit {code}):\n{out[-4000:]}")
        m = re.search(r"^LOSS (\d+) ([-0-9.ena]+)$", out, re.M)
        assert m, f"no LOSS line in worker output:\n{out[-4000:]}"
        losses[int(m.group(1))] = float(m.group(2))
    return losses


def test_two_process_training_matches_single_process():
    try:
        multi = _run_workers(num_processes=2, devices_per_proc=4)
    except (OSError, subprocess.TimeoutExpired) as e:  # sandboxed: cannot spawn/connect
        pytest.skip(f"cannot run multi-process workers here: {e}")

    assert set(multi) == {0, 1}
    # Both processes execute the same SPMD program; their computed losses are
    # the same global array.
    assert multi[0] == pytest.approx(multi[1], rel=1e-6)

    single = _run_workers(num_processes=1, devices_per_proc=8)
    # Same 8-device mesh geometry, same seeded data/permutation => the 2-process
    # run must reproduce the single-process loss (Gloo cross-process reductions
    # may reassociate float sums, hence the tolerance).
    assert multi[0] == pytest.approx(single[0], rel=1e-5, abs=1e-6)
