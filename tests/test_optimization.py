"""LR schedule golden tests: exact parity with the reference's HF-style lambdas.

The oracle is torch LambdaLR with the same lambda formulas the reference uses
(``/root/reference/src/tsfmx/optimization.py:11-48``), re-stated here
independently.
"""

import math

import numpy as np
import pytest

from multimodal_timesfm_tpu.training.optimization import (
    cosine_schedule_with_warmup,
    linear_schedule_with_warmup,
    make_schedule,
)
from multimodal_timesfm_tpu.training_args import TrainingArguments


def _hf_linear(step, warmup, total):
    if step < warmup:
        return step / max(1, warmup)
    return max(0.0, (total - step) / max(1, total - warmup))


def _hf_cosine(step, warmup, total, cycles=0.5):
    if step < warmup:
        return step / max(1, warmup)
    progress = (step - warmup) / max(1, total - warmup)
    return max(0.0, 0.5 * (1.0 + math.cos(math.pi * cycles * 2.0 * progress)))


@pytest.mark.parametrize("warmup,total", [(0, 10), (3, 10), (10, 10), (2, 100)])
def test_linear_schedule_matches_reference_lambda(warmup, total):
    base = 3e-4
    sched = linear_schedule_with_warmup(base, warmup, total)
    for step in range(total + 5):
        np.testing.assert_allclose(
            float(sched(step)), base * _hf_linear(step, warmup, total), rtol=1e-6
        )


@pytest.mark.parametrize("warmup,total", [(0, 10), (3, 10), (5, 50)])
def test_cosine_schedule_matches_reference_lambda(warmup, total):
    base = 1e-3
    sched = cosine_schedule_with_warmup(base, warmup, total)
    for step in range(total + 5):
        # fp32 cos vs python float64: ~1e-7 relative noise
        np.testing.assert_allclose(
            float(sched(step)), base * _hf_cosine(step, warmup, total), rtol=1e-5, atol=1e-9
        )


def test_make_schedule_dispatch():
    assert float(make_schedule("linear", 1.0, 0, 10)(0)) == 1.0
    assert float(make_schedule("cosine", 1.0, 0, 10)(0)) == 1.0
    with pytest.raises(NotImplementedError):
        make_schedule("constant", 1.0, 0, 10)


def test_warmup_steps_resolution(tmp_path):
    # int >= 1 -> exact; float in [0,1) -> ceil(ratio * total)
    a = TrainingArguments(output_dir=str(tmp_path / "a"), warmup_steps=7)
    assert a.get_warmup_steps(100) == 7
    b = TrainingArguments(output_dir=str(tmp_path / "b"), warmup_steps=0.05)
    assert b.get_warmup_steps(100) == 5
    c = TrainingArguments(output_dir=str(tmp_path / "c"), warmup_steps=0.041)
    assert c.get_warmup_steps(100) == 5  # ceil
    d = TrainingArguments(output_dir=str(tmp_path / "d"), warmup_steps=0.0)
    assert d.get_warmup_steps(100) == 0


def test_training_args_yaml_roundtrip(tmp_path):
    yml = tmp_path / "args.yml"
    yml.write_text(
        "output_dir: %s\nlearning_rate: 0.01\nlr_scheduler_type: cosine\n"
        "num_train_epochs: 3\nsave_strategy: best\n" % (tmp_path / "out")
    )
    args = TrainingArguments.from_yaml(yml)
    assert args.learning_rate == 0.01
    assert args.lr_scheduler_type == "cosine"
    assert args.checkpoint_dir.exists()


def test_local_sweep_sampler(tmp_path):
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    sweep = LocalSweep(
        {
            "parameters": {
                "fixed": {"value": 5},
                "choice": {"values": [1, 2, 3]},
                "u": {"distribution": "uniform", "min": 0.0, "max": 1.0},
                "lu": {"distribution": "log_uniform_values", "min": 1e-6, "max": 1e-2},
            }
        },
        tmp_path,
        seed=0,
    )
    for _ in range(10):
        s = sweep.sample()
        assert s["fixed"] == 5
        assert s["choice"] in (1, 2, 3)
        assert 0.0 <= s["u"] <= 1.0
        assert 1e-6 <= s["lu"] <= 1e-2

    logged = []

    class _Run:
        pass

    def trial(run):
        logged.append(dict(run.config.items()))
        run.log({"test/mse": 1.0})

    sweep.agent(trial, count=2)
    assert len(logged) == 2
    results = (tmp_path / "sweep_results.jsonl").read_text().strip().splitlines()
    assert len(results) == 2


def test_local_sweep_trial_isolation(tmp_path):
    """A crashed trial logs its error and the agent continues."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep
    import json
    import pytest as _pytest

    sweep = LocalSweep({"parameters": {"x": {"values": [1]}}}, tmp_path, seed=0)
    calls = []

    def flaky(run):
        calls.append(run.id)
        if len(calls) == 1:
            raise RuntimeError("boom")
        run.log({"ok": 1})

    sweep.agent(flaky, count=3)
    assert len(calls) == 3
    lines = [json.loads(l) for l in (tmp_path / "sweep_results.jsonl").read_text().splitlines()]
    assert any("error" in l for l in lines)
    assert any(l.get("ok") == 1 for l in lines)

    def always_fails(run):
        raise RuntimeError("nope")

    with _pytest.raises(RuntimeError, match="All 2"):
        LocalSweep({"parameters": {}}, tmp_path / "f", seed=0).agent(always_fails, count=2)


def test_shipped_sweep_yamls_sample_cleanly(tmp_path):
    """Every shipped sweep YAML must sample through LocalSweep (PyYAML parses
    exponent-only floats like 1e-6 as strings — regression guard)."""
    from pathlib import Path

    from multimodal_timesfm_tpu.utils.tracking import LocalSweep
    from multimodal_timesfm_tpu.utils.yaml import load_yaml

    sweep_dir = Path(__file__).parent.parent / "examples/time_mmd/configs/sweeps"
    yamls = sorted(sweep_dir.glob("*.yml"))
    assert len(yamls) >= 4
    for path in yamls:
        sweep = LocalSweep(load_yaml(path), tmp_path, seed=0)
        for _ in range(5):
            sample = sweep.sample()
            assert isinstance(sample["learning_rate"], float), path.name
            assert sample["learning_rate"] > 0
            if "fusion_hidden_dim" in sample:
                assert 256 <= sample["fusion_hidden_dim"] <= 2048


def test_shipped_training_yaml_loads(tmp_path, monkeypatch):
    from pathlib import Path

    monkeypatch.chdir(tmp_path)  # output_dir mkdirs land in tmp
    yml = Path(__file__).parent.parent / "examples/time_mmd/configs/training/default.yml"
    args = TrainingArguments.from_yaml(yml)
    assert args.lr_scheduler_type == "cosine"
    assert args.learning_rate == 1e-4
    assert args.load_best_model_at_end
