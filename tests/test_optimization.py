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
    import json

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
    rows = [
        json.loads(l)
        for l in (tmp_path / "sweep_results.jsonl").read_text().strip().splitlines()
    ]
    # one metric row per trial, plus the id-claiming trial_start records
    assert sum(1 for r in rows if "test/mse" in r) == 2
    assert sum(1 for r in rows if r.get("event") == "trial_start") == 2


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


def test_lowmem_adam_fp32_matches_optax_adamw():
    """scale_by_adam_lowmem(moment_dtype=fp32) == optax.adamw step-for-step."""
    import jax
    import jax.numpy as jnp

    from multimodal_timesfm_tpu.training.optimization import make_optimizer, make_schedule

    sched = make_schedule("linear", 1e-2, 2, 10)
    ref = make_optimizer(sched, weight_decay=0.01, max_grad_norm=1.0)
    low = make_optimizer(sched, weight_decay=0.01, max_grad_norm=1.0, moment_dtype=jnp.float32)

    rng = np.random.default_rng(0)
    params = {"w": jnp.asarray(rng.normal(size=(4, 3)), jnp.float32)}
    p_ref, s_ref = params, ref.init(params)
    p_low, s_low = params, low.init(params)
    for step in range(6):
        grads = {"w": jnp.asarray(rng.normal(size=(4, 3)) * (2.0 if step % 2 else 0.1), jnp.float32)}
        u_ref, s_ref = ref.update(grads, s_ref, p_ref)
        u_low, s_low = low.update(grads, s_low, p_low)
        p_ref = jax.tree.map(lambda p, u: p + u, p_ref, u_ref)
        p_low = jax.tree.map(lambda p, u: p + u, p_low, u_low)
        np.testing.assert_allclose(np.asarray(p_low["w"]), np.asarray(p_ref["w"]), rtol=1e-6, atol=1e-8)


def test_fused_adamw_matches_optax_chain():
    """make_fused_adamw == the optax chain trajectory, fp32 and bf16 moments,
    including steps where the global-norm clip triggers."""
    import jax
    import jax.numpy as jnp

    from multimodal_timesfm_tpu.training.optimization import (
        make_fused_adamw,
        make_optimizer,
        make_schedule,
    )

    sched = make_schedule("cosine", 1e-2, 2, 12)
    rng = np.random.default_rng(1)
    params = {
        "a": jnp.asarray(rng.normal(size=(8, 4)), jnp.float32),
        "b": {"w": jnp.asarray(rng.normal(size=(3,)), jnp.float32)},
    }

    for moment_dtype, tol in [(None, 1e-6), (jnp.bfloat16, 1e-6)]:
        chain = make_optimizer(sched, weight_decay=0.01, max_grad_norm=1.0,
                               moment_dtype=moment_dtype)
        fused = make_fused_adamw(sched, weight_decay=0.01, max_grad_norm=1.0,
                                 moment_dtype=moment_dtype)
        p_ref, s_ref = params, chain.init(params)
        p_fu, s_fu = params, fused.init(params)
        for step in range(8):
            # alternate small grads (no clip) and huge grads (clip triggers)
            scale = 100.0 if step % 3 == 2 else 0.05
            g = jax.tree.map(
                lambda p: jnp.asarray(rng.normal(size=p.shape) * scale, jnp.float32),
                params,
            )
            u, s_ref = chain.update(g, s_ref, p_ref)
            p_ref = jax.tree.map(lambda p, du: p + du, p_ref, u)
            p_fu, s_fu = fused.step(g, s_fu, p_fu)
            jax.tree.map(
                lambda a, b: np.testing.assert_allclose(
                    np.asarray(a), np.asarray(b), rtol=tol, atol=1e-7
                ),
                p_fu,
                p_ref,
            )
        # moment storage dtype parity with the chain
        if moment_dtype is not None:
            assert all(
                l.dtype == moment_dtype
                for l in jax.tree.leaves(s_fu.mu) + jax.tree.leaves(s_fu.nu)
            )


def test_trainer_fused_optimizer_matches_chain(tmp_path):
    """The trainer's default fused stepper reproduces the optax-chain
    trajectory end-to-end (same data, same seed, fused_optimizer on/off).

    One optimizer step, no clip: the bit-exact regime (measured 0.0 diff).
    Multi-step runs compile to different programs (the optimizer fuses into
    the scan differently), whose ~1e-8 gradient-rounding differences Adam's
    near-zero-denominator sensitivity amplifies chaotically — the same growth
    ANY recompilation exhibits, so multi-step/clip-on equivalence is pinned
    at the optimizer level in test_fused_adamw_matches_optax_chain above."""
    import jax
    import numpy as _np

    from multimodal_timesfm_tpu.data.dataset import PreprocessedDataset
    from multimodal_timesfm_tpu.models.decoder import (
        MultimodalDecoder,
        MultimodalDecoderConfig,
    )
    from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
    from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
    from multimodal_timesfm_tpu.types import PreprocessedSample

    rng = _np.random.default_rng(3)
    samples = [
        PreprocessedSample(
            context=rng.normal(size=16).astype(_np.float32),
            horizon=rng.normal(size=8).astype(_np.float32),
            metadata={},
        )
        for _ in range(16)
    ]

    def run(fused):
        decoder = MultimodalDecoder(
            TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig()
        )
        params = decoder.init(jax.random.key(0))
        trainer = MultimodalTrainer(
            model=decoder,
            params=params,
            args=TrainingArguments(
                output_dir=str(tmp_path / f"fused{fused}"),
                per_device_train_batch_size=16,
                num_train_epochs=1,
                learning_rate=1e-2,
                eval_strategy="no",
                save_strategy="no",
                logging_strategy="no",
                seed=0,
                max_grad_norm=0.0,
            ),
            train_dataset=PreprocessedDataset(samples, "baseline"),
            val_dataset=PreprocessedDataset(samples[:8], "baseline"),
            mode="baseline",
            fused_optimizer=fused,
        )
        losses = [trainer.train_epoch()]
        return losses, jax.device_get(trainer.state.trainable)

    losses_f, params_f = run(True)
    losses_c, params_c = run(False)
    np.testing.assert_allclose(losses_f, losses_c, rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8),
        params_f,
        params_c,
    )


def test_lowmem_adam_bf16_state_dtype():
    """bf16 moment storage: state leaves are actually bf16 (the HBM win)."""
    import jax.numpy as jnp

    from multimodal_timesfm_tpu.training.optimization import make_optimizer, make_schedule

    opt = make_optimizer(
        make_schedule("linear", 1e-3, 0, 10), 0.0, 1.0, moment_dtype=jnp.bfloat16
    )
    import jax

    params = {"w": jnp.ones((2, 2), jnp.float32)}
    state = opt.init(params)
    moment_leaves = [l for l in jax.tree.leaves(state) if getattr(l, "shape", None) == (2, 2)]
    assert moment_leaves and all(l.dtype == jnp.bfloat16 for l in moment_leaves)


def test_clip_global_norm_fp32_accumulation():
    """bf16 gradients clip by an fp32-accumulated norm; fp32 matches optax.

    optax.clip_by_global_norm measures the norm in the grads' dtype, which
    makes the result depend on how the backend lowers a bf16 reduce (XLA's
    tree reduction happens to stay accurate; a sequential accumulator would
    saturate). The fp32-accumulating clip removes that dependence and stays
    bit-identical to optax for fp32 inputs.
    """
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_timesfm_tpu.training.optimization import clip_by_global_norm_fp32

    rng = np.random.default_rng(0)
    big = rng.normal(size=(1 << 20,)).astype(np.float32)  # true norm ~1024
    grads_bf16 = {"w": jnp.asarray(big, jnp.bfloat16)}
    grads_fp32 = {"w": jnp.asarray(big, jnp.float32)}

    clip = clip_by_global_norm_fp32(1.0)
    out_bf16, _ = clip.update(grads_bf16, clip.init(grads_bf16))
    out_fp32, _ = clip.update(grads_fp32, clip.init(grads_fp32))

    # fp32 path: bit-identical to optax's clip.
    ref = optax.clip_by_global_norm(1.0)
    ref_out, _ = ref.update(grads_fp32, ref.init(grads_fp32))
    np.testing.assert_array_equal(np.asarray(out_fp32["w"]), np.asarray(ref_out["w"]))

    # bf16 path: clipped to unit norm up to bf16 element rounding,
    # independent of the backend's reduction lowering.
    def norm(t):
        return float(jnp.sqrt(sum(jnp.sum(jnp.square(x.astype(jnp.float32)))
                                  for x in jax.tree.leaves(t))))

    assert abs(norm(out_bf16) - 1.0) < 0.05, norm(out_bf16)
    # No-clip case: grads below the threshold pass through untouched.
    small = {"w": jnp.asarray(big[:16] * 1e-4, jnp.bfloat16)}
    passthrough, _ = clip.update(small, clip.init(small))
    np.testing.assert_array_equal(np.asarray(passthrough["w"]), np.asarray(small["w"]))


def test_local_sweep_bayes_concentrates(tmp_path):
    """TPE engine (method: bayes) concentrates later samples near a planted
    optimum and beats random search at a fixed trial count (VERDICT r2 #2)."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    space = {
        "metric": {"name": "test/mse", "goal": "minimize"},
        "parameters": {
            "learning_rate": {
                "distribution": "log_uniform_values", "min": 1e-5, "max": 1e-1
            },
            "weight_decay": {"distribution": "uniform", "min": 0.0, "max": 0.1},
            "batch_size": {"values": [8, 16, 32]},
        },
    }

    def objective(cfg):
        # Planted optimum: lr=1e-3, wd=0.02, batch=16.
        return (
            (math.log10(cfg["learning_rate"]) + 3.0) ** 2
            + 10.0 * (cfg["weight_decay"] - 0.02) ** 2
            + (0.0 if cfg["batch_size"] == 16 else 0.5)
        )

    def run_sweep(method, seed):
        sweep = LocalSweep(
            {**space, "method": method}, tmp_path / method, seed=seed, n_startup=10
        )
        trials = []

        def fn(run):
            cfg = {k: getattr(run.config, k) for k in ("learning_rate", "weight_decay", "batch_size")}
            trials.append(cfg)
            run.log({"test/mse": objective(cfg)})

        sweep.agent(fn, count=50)
        return trials

    bayes = run_sweep("bayes", 0)
    random_ = run_sweep("random", 0)
    bayes_vals = [objective(c) for c in bayes]
    random_vals = [objective(c) for c in random_]

    # Later Bayes samples concentrate near the optimum: the post-startup
    # tail's mean objective beats both its own random startup phase and the
    # pure-random sweep's mean over the same trial budget.
    assert np.mean(bayes_vals[30:]) < np.mean(bayes_vals[:10])
    assert np.mean(bayes_vals[30:]) < np.mean(random_vals)
    # And the lr coordinate specifically tightens around 1e-3.
    lr_err = lambda cs: np.mean([abs(math.log10(c["learning_rate"]) + 3.0) for c in cs])  # noqa: E731
    assert lr_err(bayes[30:]) < lr_err(bayes[:10])


def test_local_sweep_bayes_maximize_orientation(tmp_path):
    """goal: maximize flips the orientation fed to TPE."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    space = {
        "method": "bayes",
        "metric": {"name": "score", "goal": "maximize"},
        "parameters": {"x": {"distribution": "uniform", "min": 0.0, "max": 1.0}},
    }
    sweep = LocalSweep(space, tmp_path, seed=1, n_startup=8)

    def fn(run):
        run.log({"score": -((run.config.x - 0.8) ** 2)})  # maximized at x=0.8

    sweep.agent(fn, count=40)
    xs = [c["x"] for c, _ in sweep._observations]
    assert abs(np.mean(xs[25:]) - 0.8) < abs(np.mean(xs[:8]) - 0.8)


def test_local_sweep_bayes_int_uniform(tmp_path):
    """TPE models int_uniform params in continuous space and emits ints in range."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    space = {
        "method": "bayes",
        "metric": {"name": "loss", "goal": "minimize"},
        "parameters": {"n": {"distribution": "int_uniform", "min": 1, "max": 32}},
    }
    sweep = LocalSweep(space, tmp_path, seed=3, n_startup=8)

    def fn(run):
        run.log({"loss": (run.config.n - 20) ** 2})  # optimum n=20

    sweep.agent(fn, count=40)
    ns = [c["n"] for c, _ in sweep._observations]
    assert all(isinstance(n, int) and 1 <= n <= 32 for n in ns)
    # Later samples sit closer to the planted optimum than the startup draws.
    assert np.mean(np.abs(np.array(ns[25:]) - 20)) < np.mean(np.abs(np.array(ns[:8]) - 20))


def test_local_sweep_state_survives_restart(tmp_path):
    """A re-launched offline Bayes sweep restores its TPE observation
    history from sweep_state.jsonl and continues trial numbering."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    space = {
        "method": "bayes",
        "metric": {"name": "loss", "goal": "minimize"},
        "parameters": {"x": {"distribution": "uniform", "min": 0.0, "max": 1.0}},
    }

    def fn(run):
        run.log({"loss": (run.config.x - 0.3) ** 2})

    first = LocalSweep(space, tmp_path, seed=0, n_startup=10)
    first.agent(fn, count=12)
    assert len(first._observations) == 12

    # New process simulation: a fresh LocalSweep over the same output dir.
    second = LocalSweep(space, tmp_path, seed=1, n_startup=10)
    assert len(second._observations) == 12  # restored, past startup
    second.agent(fn, count=5)
    assert len(second._observations) == 17
    # Trial ids continue instead of overwriting local-0..4.
    import json as _json

    rows = [
        _json.loads(l)
        for l in (tmp_path / "sweep_results.jsonl").read_text().splitlines()
    ]
    assert any(r["run_id"] == "local-16" for r in rows)
    # Post-restart samples use the restored history (TPE active, not startup):
    xs = [c["x"] for c, _ in second._observations[12:]]
    assert np.mean(np.abs(np.array(xs) - 0.3)) < 0.25


def test_next_trial_index_skips_failed_trials(tmp_path):
    """Run-id numbering scans the results log, not the observation count —
    failed trials (no metric logged) must not cause duplicate ids on resume."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    space = {
        "method": "bayes",
        "metric": {"name": "loss", "goal": "minimize"},
        "parameters": {"x": {"distribution": "uniform", "min": 0.0, "max": 1.0}},
    }
    calls = []

    def flaky(run):
        calls.append(run.id)
        if len(calls) == 2:
            raise RuntimeError("boom")  # trial 1 fails -> no observation
        run.log({"loss": run.config.x})

    first = LocalSweep(space, tmp_path, seed=0)
    first.agent(flaky, count=3)
    assert len(first._observations) == 2  # one trial produced nothing

    second = LocalSweep(space, tmp_path, seed=1)
    assert second.next_trial_index() == 3  # from the log, not len(observations)
    second.agent(flaky, count=1)
    import json as _json

    ids = [
        _json.loads(l)["run_id"]
        for l in (tmp_path / "sweep_results.jsonl").read_text().splitlines()
    ]
    assert len(set(ids)) == len(set(ids) | {"local-3"})  # no duplicates, continued


def test_resumed_sweep_does_not_replay_configs(tmp_path):
    """A relaunched sweep must draw FRESH configs, not replay the base
    seed's sequence (review finding r3: same-seed resume wasted the whole
    resumed budget on duplicate trials)."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    space = {
        "method": "bayes",
        "metric": {"name": "loss", "goal": "minimize"},
        "parameters": {"x": {"distribution": "uniform", "min": 0.0, "max": 1.0}},
    }

    def fn(run):
        run.log({"loss": run.config.x})

    first = LocalSweep(space, tmp_path, seed=0, n_startup=100)  # stays random
    first.agent(fn, count=4)
    first_xs = [c["x"] for c, _ in first._observations]

    # Same seed, same output dir — the resumed engine must not repeat them.
    second = LocalSweep(space, tmp_path, seed=0, n_startup=100)
    second.agent(fn, count=4)
    second_xs = [c["x"] for c, _ in second._observations[4:]]
    assert not np.allclose(sorted(first_xs), sorted(second_xs))


def test_local_sweep_wandb_default_distributions(tmp_path):
    """Bare {min,max} specs use W&B's implicit defaults offline too:
    int_uniform when both bounds are ints, uniform otherwise; specs without
    min/max raise the informative spec error (review findings)."""
    import pytest

    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    sweep = LocalSweep(
        {
            "parameters": {
                "lr": {"min": 0.0001, "max": 0.1},          # -> uniform
                "epochs": {"min": 1, "max": 4},              # -> int_uniform
            }
        },
        tmp_path,
        seed=0,
    )
    for _ in range(20):
        s = sweep.sample()
        assert 0.0001 <= s["lr"] <= 0.1 and isinstance(s["lr"], float)
        assert s["epochs"] in (1, 2, 3, 4) and isinstance(s["epochs"], int)

    bad = LocalSweep(
        {"parameters": {"x": {"distribution": "normal", "mu": 0, "sigma": 1}}},
        tmp_path / "bad",
        seed=0,
    )
    with pytest.raises(ValueError, match="min/max"):
        bad.sample()


def test_local_sweep_count_zero_runs_nothing(tmp_path):
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    sweep = LocalSweep({"parameters": {"x": {"values": [1]}}}, tmp_path, seed=0)
    calls = []
    sweep.agent(lambda run: calls.append(run.id), count=0)
    assert calls == []
    assert not (tmp_path / "sweep_results.jsonl").exists()


def test_local_sweep_killed_trial_does_not_reuse_run_id(tmp_path):
    """A trial killed mid-run leaves its trial_start record, so a relaunch
    continues numbering instead of reusing the id (review finding: only
    trials that logged a metric counted toward next_trial_index)."""
    from multimodal_timesfm_tpu.utils.tracking import LocalSweep

    sweep = LocalSweep({"parameters": {"x": {"values": [1]}}}, tmp_path, seed=0)

    class _Kill(BaseException):
        """Simulates SIGKILL: not caught by the agent's per-trial isolation."""

    def killed(run):
        raise _Kill()

    try:
        sweep.agent(killed, count=1)
    except _Kill:
        pass
    # the dead trial claimed local-0 on disk before training started
    relaunched = LocalSweep({"parameters": {"x": {"values": [1]}}}, tmp_path, seed=0)
    assert relaunched.next_trial_index() == 1
