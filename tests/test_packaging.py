"""Installed-package smoke test (packaging parity, VERDICT r3 #6).

Builds and installs the package with pip into a temp target (offline:
``--no-build-isolation --no-deps``) and verifies that the INSTALLED copy —
not the repo checkout — imports, ships ``py.typed``, constructs an adapter,
and that the C++ wordpiece extension falls back gracefully when the shared
library is absent from the wheel. CI runs the clean-venv equivalent
(``.github/workflows/ci.yml`` package job); the reference's publish pipeline
is mirrored in ``publish-to-pypi.yml``
(reference: ``.github/workflows/publish-to-pypi.yml``).
"""

import subprocess
import sys
from pathlib import Path

import pytest

_REPO = Path(__file__).resolve().parents[1]

_SMOKE = """
import jax
jax.config.update("jax_platforms", "cpu")
import pathlib
import multimodal_timesfm_tpu
pkg = pathlib.Path(multimodal_timesfm_tpu.__file__).parent
assert str(pkg).startswith({site!r}), multimodal_timesfm_tpu.__file__
assert (pkg / "py.typed").exists(), "py.typed must ship with the package"
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.text.native import load_library
load_library()  # absent extension must fall back (None), not raise
adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
assert adapter.patch_len == 4
print("INSTALLED_OK")
"""


def test_pip_install_smoke(tmp_path):
    site = tmp_path / "site"
    build = subprocess.run(
        [
            sys.executable, "-m", "pip", "install",
            "--no-build-isolation", "--no-deps", "--quiet",
            "--target", str(site), str(_REPO),
        ],
        capture_output=True,
        text=True,
        timeout=300,
    )
    if build.returncode != 0:
        if "No module named pip" in build.stderr or "network" in build.stderr.lower():
            pytest.skip(f"pip unavailable here:\n{build.stderr[-1000:]}")
        raise AssertionError(f"pip install failed:\n{build.stderr[-4000:]}")

    import os

    env = dict(os.environ)
    # Installed copy first; keep the axon sitecustomize importable (never
    # overwrite PYTHONPATH — CLAUDE.md env quirk). The repo root must NOT be
    # on the path, so the import resolves to the installed package.
    env["PYTHONPATH"] = f"{site}{os.pathsep}" + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    run = subprocess.run(
        [sys.executable, "-c", _SMOKE.format(site=str(site))],
        capture_output=True,
        text=True,
        timeout=300,
        env=env,
        cwd=str(tmp_path),  # away from the repo root
    )
    assert run.returncode == 0, f"installed-package smoke failed:\n{run.stdout}\n{run.stderr[-4000:]}"
    assert "INSTALLED_OK" in run.stdout
