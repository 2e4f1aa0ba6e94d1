"""Experiment tracking: optional W&B + an offline local sweep engine.

W&B is an optional dependency in the reference too
(``/root/reference/pyproject.toml:32-38``; ``trainer.py:62`` disables logging
when no run is passed). Here the import is gated, and sweeping additionally
works fully offline: ``LocalSweep`` samples the same W&B sweep-YAML parameter
space (values / uniform / log_uniform_values distributions) with random
search, logging results to JSONL — so the sweep scripts run in zero-egress
environments and on W&B when it is installed and configured.
"""

from __future__ import annotations

import json
import math
import time
from pathlib import Path
from typing import Any

import numpy as np


def try_import_wandb():
    """Return the wandb module or None (optional dependency)."""
    try:
        import wandb

        return wandb
    except ImportError:
        return None


class LocalRun:
    """Minimal stand-in for a wandb Run: .config attribute access + .log to JSONL."""

    def __init__(self, run_id: str, config: dict[str, Any], log_path: Path) -> None:
        self.id = run_id
        self.config = _Config(config)
        self._log_path = log_path
        self._log_path.parent.mkdir(parents=True, exist_ok=True)

    def log(self, metrics: dict[str, Any], step: int | None = None) -> None:
        record = {"run_id": self.id, "step": step, "time": time.time(), **metrics}
        with open(self._log_path, "a") as f:
            f.write(json.dumps(record) + "\n")

    def __enter__(self):
        return self

    def __exit__(self, *exc):
        return False


class _Config:
    """dict with attribute + .get access, like wandb's run config."""

    def __init__(self, values: dict[str, Any]) -> None:
        self._values = dict(values)

    def __getattr__(self, name: str):
        try:
            return self._values[name]
        except KeyError as e:
            raise AttributeError(name) from e

    def get(self, name: str, default=None):
        return self._values.get(name, default)

    def __iter__(self):
        return iter(self._values)

    def items(self):
        return self._values.items()


class LocalSweep:
    """Random-search sampler over a W&B sweep-YAML parameter space."""

    def __init__(self, sweep_config: dict[str, Any], output_dir: Path, seed: int = 0) -> None:
        self.parameters = sweep_config.get("parameters", {})
        self.metric = sweep_config.get("metric", {})
        self.output_dir = Path(output_dir)
        self._rng = np.random.default_rng(seed)

    def _sample_one(self, spec: dict[str, Any]):
        if "value" in spec:
            return spec["value"]
        if "values" in spec:
            values = spec["values"]
            return values[int(self._rng.integers(len(values)))]
        dist = spec.get("distribution")
        # PyYAML (YAML 1.1) parses exponent-only floats like `1e-6` as
        # strings — the shipped sweep YAMLs use that form, so coerce.
        lo, hi = float(spec.get("min")), float(spec.get("max"))
        if dist == "uniform":
            return float(self._rng.uniform(lo, hi))
        if dist == "log_uniform_values":
            return float(math.exp(self._rng.uniform(math.log(lo), math.log(hi))))
        if dist == "int_uniform":
            return int(self._rng.integers(int(lo), int(hi) + 1))
        raise ValueError(f"Unsupported parameter spec: {spec}")

    def sample(self) -> dict[str, Any]:
        return {name: self._sample_one(spec) for name, spec in self.parameters.items()}

    def agent(self, function, count: int | None = None) -> None:
        """Run ``count`` trials (default 1), each inside a LocalRun context.

        Trial failures are isolated — a crashed trial logs its error and the
        agent continues, mirroring the W&B agent's per-run isolation that the
        reference relies on for sweep robustness.
        """
        results_path = self.output_dir / "sweep_results.jsonl"
        failures = 0
        for trial in range(count or 1):
            run = LocalRun(f"local-{trial}", {}, results_path)
            try:
                run.config = _Config(self.sample())
                with run:
                    function(run)
            except Exception as e:  # noqa: BLE001 - trial isolation
                failures += 1
                run.log({"error": f"{type(e).__name__}: {e}"})
        if failures == (count or 1):
            raise RuntimeError(f"All {failures} sweep trial(s) failed; see {results_path}")
