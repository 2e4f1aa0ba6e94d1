"""Driver-entry contract tests: dryrun_multichip must self-configure devices.

Round-1 VERDICT weak #1: the driver runs ``dryrun_multichip`` in a process
whose default platform is the single-chip TPU; the function must force an
n-device virtual CPU platform itself. Under pytest the conftest has already
initialized an 8-device CPU backend, which exercises the "live usable
platform" early-return branch; the fresh-process branch is covered by a
subprocess run.
"""

import os
import subprocess
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import __graft_entry__  # noqa: E402


def test_dryrun_multichip_accepts_live_cpu_platform():
    # Backend is already initialized (conftest: 8 virtual CPU devices); the
    # guard must accept it and the full dp=4 x mp=2 training step must run.
    __graft_entry__.dryrun_multichip(8)


def test_force_virtual_cpu_platform_rejects_too_few_devices():
    with pytest.raises(RuntimeError, match="16 devices"):
        __graft_entry__._force_virtual_cpu_platform(16)


def test_dryrun_multichip_fresh_process_forces_platform():
    # Simulate the driver: no JAX_PLATFORMS/XLA_FLAGS help, sitecustomize may
    # register the TPU plugin; dryrun_multichip(2) must still succeed.
    env = {k: v for k, v in os.environ.items() if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    proc = subprocess.run(
        [sys.executable, "-c", "import __graft_entry__; __graft_entry__.dryrun_multichip(2)"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    for backbone in ("timesfm", "chronos"):
        for path in ("multimodal-loop", "baseline-fused", "evaluator", "serving"):
            assert f"dryrun_multichip OK [{backbone}/{path}]" in proc.stdout
