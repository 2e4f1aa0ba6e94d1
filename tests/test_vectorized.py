"""Vectorized sweep-trial training: optimizer parity + trainer equivalence."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_timesfm_tpu.data.collate import StackedDataset
from multimodal_timesfm_tpu.data.dataset import PreprocessedDataset
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.optimization import make_optimizer, make_schedule
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training.vectorized import (
    adamw_init,
    adamw_update,
    evaluate_vectorized,
    run_vectorized_trials,
    schedule_scale,
    stack_trainables,
)
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import PreprocessedSample

CONTEXT, HORIZON, TEXT_DIMS = 16, 8, 6


@pytest.mark.parametrize("kind", ["linear", "cosine"])
@pytest.mark.parametrize("lr,wd,warmup", [(1e-2, 0.01, 3), (3e-3, 0.0, 0)])
def test_functional_adamw_matches_optax_chain(kind, lr, wd, warmup):
    """adamw_update + schedule_scale == optax.chain(clip, adamw(schedule))."""
    total = 12
    rng = np.random.default_rng(0)
    params = {
        "a": jnp.asarray(rng.normal(size=(4, 5)), jnp.float32),
        "b": {"c": jnp.asarray(rng.normal(size=(7,)), jnp.float32)},
    }
    sched = make_schedule(kind, lr, warmup, total)
    opt = make_optimizer(sched, wd, max_grad_norm=1.0)
    opt_state = opt.init(params)
    p_ref = params
    p_new = params
    state = adamw_init(params)
    for step in range(total):
        grads = jax.tree.map(
            lambda x: jnp.asarray(rng.normal(size=x.shape) * (3.0 if step % 3 else 0.1), x.dtype),
            params,
        )
        updates, opt_state = opt.update(grads, opt_state, p_ref)
        p_ref = jax.tree.map(lambda p, u: p + u, p_ref, updates)

        step_lr = lr * schedule_scale(state["count"], float(warmup), total, kind)
        p_new, state = adamw_update(grads, state, p_new, step_lr, wd, max_grad_norm=1.0)
        jax.tree.map(
            lambda a, b: np.testing.assert_allclose(a, b, rtol=2e-6, atol=1e-7), p_ref, p_new
        )


def _make_samples(n, seed, with_text=True):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        s = PreprocessedSample(
            context=rng.normal(size=CONTEXT).astype(np.float32),
            horizon=rng.normal(size=HORIZON).astype(np.float32),
            metadata={"i": i},
        )
        if with_text:
            s["text_embeddings"] = rng.normal(size=(4, TEXT_DIMS)).astype(np.float32)
        out.append(s)
    return out


def _decoder():
    return MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()),
        MultimodalDecoderConfig(text_embedding_dims=TEXT_DIMS),
    )


def _data(samples):
    d = StackedDataset(
        context=np.stack([s["context"] for s in samples]),
        horizon=np.stack([s["horizon"] for s in samples]),
        text_embeddings=np.stack([s["text_embeddings"] for s in samples]),
        metadata=[{}] * len(samples),
    )
    return {"context": d.context, "horizon": d.horizon, "text": d.text_embeddings}


def test_single_trial_matches_trainer(tmp_path):
    """A T=1 vectorized run reproduces MultimodalTrainer's fused training."""
    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    train_s, val_s = _make_samples(20, 0), _make_samples(12, 1)

    seed, lr, wd, epochs, batch = 7, 1e-2, 0.01, 3, 8
    trainer = MultimodalTrainer(
        model=decoder,
        params=jax.tree.map(lambda x: x.copy(), params),
        args=TrainingArguments(
            output_dir=str(tmp_path),
            per_device_train_batch_size=batch,
            per_device_eval_batch_size=batch,
            num_train_epochs=epochs,
            learning_rate=lr,
            weight_decay=wd,
            lr_scheduler_type="linear",
            warmup_steps=2,
            eval_strategy="epoch",
            # "best": the fused path only tracks the device-side best
            # trainable subtree when something will consume it.
            save_strategy="best",
            logging_strategy="no",
            seed=seed,
        ),
        train_dataset=PreprocessedDataset(train_s, "multimodal"),
        val_dataset=PreprocessedDataset(val_s, "multimodal"),
        mode="multimodal",
    )
    _, trainer_vals = trainer.train_epochs_fused(epochs)

    results = run_vectorized_trials(
        decoder,
        {k: v for k, v in params.items() if k != "fusion"},
        stack_trainables([params["fusion"]]),
        _data(train_s),
        _data(val_s),
        {
            "learning_rate": np.asarray([lr]),
            "weight_decay": np.asarray([wd]),
            "warmup_steps": np.asarray([2.0]),
        },
        horizon_len=HORIZON,
        batch_size=batch,
        num_epochs=epochs,
        scheduler="linear",
        seed=seed,
    )
    np.testing.assert_allclose(results.val_losses[0], trainer_vals, rtol=1e-5)
    np.testing.assert_allclose(
        results.best_val[0], trainer._fused_best["val"], rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        jax.tree.map(lambda x: x[0], results.best_trainable),
        jax.device_get(trainer._fused_best["trainable"]),
    )


def test_trials_differ_and_match_independent_runs():
    """Trial t of a T=3 batch == an independent T=1 run with seed+t."""
    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    frozen = {k: v for k, v in params.items() if k != "fusion"}
    train_s, val_s = _make_samples(16, 0), _make_samples(8, 1)
    lrs = np.asarray([1e-3, 1e-2, 5e-2])
    inits = [
        decoder.init(jax.random.key(100 + t))["fusion"] for t in range(3)
    ]

    kw = dict(
        horizon_len=HORIZON, batch_size=8, num_epochs=2, scheduler="cosine", seed=3
    )
    batch_res = run_vectorized_trials(
        decoder,
        frozen,
        stack_trainables(inits),
        _data(train_s),
        _data(val_s),
        {
            "learning_rate": lrs,
            "weight_decay": np.asarray([0.01, 0.0, 0.001]),
            "warmup_steps": np.asarray([0.0, 1.0, 2.0]),
        },
        **kw,
    )
    # different hyperparams -> different outcomes
    assert len({round(float(v), 8) for v in batch_res.best_val}) == 3

    solo = run_vectorized_trials(
        decoder,
        frozen,
        stack_trainables([inits[1]]),
        _data(train_s),
        _data(val_s),
        {
            "learning_rate": lrs[1:2],
            "weight_decay": np.asarray([0.0]),
            "warmup_steps": np.asarray([1.0]),
        },
        **{**kw, "seed": 4},  # trial 1 of the batch drew from seed 3 + 1
    )
    np.testing.assert_allclose(solo.val_losses[0], batch_res.val_losses[1], rtol=1e-5)


def test_evaluate_vectorized_matches_evaluator():
    from multimodal_timesfm_tpu.training.evaluator import MultimodalEvaluator

    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    frozen = {k: v for k, v in params.items() if k != "fusion"}
    test_s = _make_samples(13, 5)

    mse, mae = evaluate_vectorized(
        decoder,
        frozen,
        stack_trainables([params["fusion"]]),
        _data(test_s),
        horizon_len=HORIZON,
        batch_size=4,
    )
    ref = MultimodalEvaluator(decoder).evaluate(
        params, PreprocessedDataset(test_s, "multimodal"), batch_size=4, multimodal=True
    )
    np.testing.assert_allclose(mse[0], ref["mse"], rtol=1e-5)
    np.testing.assert_allclose(mae[0], ref["mae"], rtol=1e-5)


def test_trial_axis_shards_over_mesh():
    """Trials sharded over the mesh data axis == the unsharded run.

    Sweeps scale across chips with zero communication: the trial axis is
    embarrassingly parallel (frozen backbone + data replicated).
    """
    from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    frozen = {k: v for k, v in params.items() if k != "fusion"}
    train_s, val_s = _make_samples(16, 0), _make_samples(8, 1)
    t = 8
    rng = np.random.default_rng(5)
    hp = {
        "learning_rate": rng.uniform(1e-3, 1e-2, t),
        "weight_decay": rng.uniform(0.0, 0.01, t),
        "warmup_steps": rng.uniform(0, 2, t),
    }
    inits = stack_trainables(
        [decoder.init(jax.random.key(10 + i))["fusion"] for i in range(t)]
    )
    kw = dict(horizon_len=HORIZON, batch_size=8, num_epochs=2, scheduler="linear", seed=0)

    plain = run_vectorized_trials(
        decoder, frozen, inits, _data(train_s), _data(val_s), hp, **kw
    )
    sharded = run_vectorized_trials(
        decoder,
        frozen,
        stack_trainables([decoder.init(jax.random.key(10 + i))["fusion"] for i in range(t)]),
        _data(train_s),
        _data(val_s),
        hp,
        mesh=mesh,
        **kw,
    )
    np.testing.assert_allclose(sharded.val_losses, plain.val_losses, rtol=1e-5)
    np.testing.assert_allclose(sharded.best_val, plain.best_val, rtol=1e-5)

    with pytest.raises(ValueError, match="divisible"):
        run_vectorized_trials(
            decoder,
            frozen,
            stack_trainables([params["fusion"]] * 3),
            _data(train_s),
            _data(val_s),
            {k: v[:3] for k, v in hp.items()},
            mesh=mesh,
            **kw,
        )


def test_replicate_trainables_stages_shards_directly():
    """replicate_trainables == stack_trainables([init]*T), and with a sharding
    each leaf lands trial-sharded over the mesh (review finding r3-late: the
    T-wide stack must never be resident on a single device at baseline scale)."""
    from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh
    from multimodal_timesfm_tpu.training.vectorized import (
        replicate_trainables,
        trial_sharding,
    )

    decoder = _decoder()
    init = decoder.init(jax.random.key(0))["fusion"]
    t = 8

    plain = replicate_trainables(init, t)
    stacked = stack_trainables([init] * t)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), plain, stacked)

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    ts = trial_sharding(mesh)
    sharded = replicate_trainables(init, t, ts)
    for leaf in jax.tree.leaves(sharded):
        assert leaf.sharding == ts
        # each of the 8 devices holds exactly its 1-trial shard
        shard_shapes = {s.data.shape for s in leaf.addressable_shards}
        assert shard_shapes == {(1,) + leaf.shape[1:]}
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), sharded, stacked)


def test_sharded_staging_end_to_end_parity():
    """Pre-sharded inits (replicate_trainables) through run_vectorized_trials
    + evaluate_vectorized(mesh=...) match the unsharded pipeline, and the
    tracked best stays trial-sharded on device between the two calls."""
    from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh
    from multimodal_timesfm_tpu.training.vectorized import (
        replicate_trainables,
        trial_sharding,
    )

    mesh = make_mesh(MeshConfig(data_parallel=8, model_parallel=1))
    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    frozen = {k: v for k, v in params.items() if k != "fusion"}
    train_s, val_s, test_s = _make_samples(16, 0), _make_samples(8, 1), _make_samples(13, 5)
    t = 8
    rng = np.random.default_rng(5)
    hp = {
        "learning_rate": rng.uniform(1e-3, 1e-2, t),
        "weight_decay": rng.uniform(0.0, 0.01, t),
        "warmup_steps": rng.uniform(0, 2, t),
    }
    kw = dict(horizon_len=HORIZON, batch_size=8, num_epochs=2, scheduler="linear", seed=0)

    plain = run_vectorized_trials(
        decoder, frozen, replicate_trainables(params["fusion"], t),
        _data(train_s), _data(val_s), hp, **kw,
    )
    ts = trial_sharding(mesh)
    sharded = run_vectorized_trials(
        decoder, frozen, replicate_trainables(params["fusion"], t, ts),
        _data(train_s), _data(val_s), hp, mesh=mesh, **kw,
    )
    np.testing.assert_allclose(sharded.val_losses, plain.val_losses, rtol=1e-5)
    np.testing.assert_allclose(sharded.best_val, plain.best_val, rtol=1e-5)
    for leaf in jax.tree.leaves(sharded.best_trainable):
        assert isinstance(leaf, jax.Array) and leaf.sharding == ts

    mse_p, mae_p = evaluate_vectorized(
        decoder, frozen, plain.best_trainable, _data(test_s),
        horizon_len=HORIZON, batch_size=4,
    )
    mse_s, mae_s = evaluate_vectorized(
        decoder, frozen, sharded.best_trainable, _data(test_s),
        horizon_len=HORIZON, batch_size=4, mesh=mesh,
    )
    np.testing.assert_allclose(mse_s, mse_p, rtol=1e-5)
    np.testing.assert_allclose(mae_s, mae_p, rtol=1e-5)


def test_vectorized_quantile_loss_matches_trainer(tmp_path):
    """loss_type='quantile' trains the same composite objective as the trainer."""
    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    train_s, val_s = _make_samples(16, 0), _make_samples(8, 1)
    seed, lr, epochs, batch = 3, 1e-2, 2, 8

    trainer = MultimodalTrainer(
        model=decoder,
        params=jax.tree.map(lambda x: x.copy(), params),
        args=TrainingArguments(
            output_dir=str(tmp_path),
            per_device_train_batch_size=batch,
            per_device_eval_batch_size=batch,
            num_train_epochs=epochs,
            learning_rate=lr,
            loss_type="quantile",
            eval_strategy="epoch",
            save_strategy="no",
            logging_strategy="no",
            seed=seed,
        ),
        train_dataset=PreprocessedDataset(train_s, "multimodal"),
        val_dataset=PreprocessedDataset(val_s, "multimodal"),
        mode="multimodal",
    )
    trainer_losses, _ = trainer.train_epochs_fused(epochs)

    results = run_vectorized_trials(
        decoder,
        {k: v for k, v in params.items() if k != "fusion"},
        stack_trainables([params["fusion"]]),
        _data(train_s),
        _data(val_s),
        {
            "learning_rate": np.asarray([lr]),
            "weight_decay": np.asarray([0.0]),
            "warmup_steps": np.asarray([0.0]),
        },
        horizon_len=HORIZON,
        batch_size=batch,
        num_epochs=epochs,
        seed=seed,
        loss_type="quantile",
    )
    np.testing.assert_allclose(results.train_losses[0], trainer_losses, rtol=1e-5)


def test_jit_caches_are_bounded():
    """The keyed jit caches evict oldest entries (decoders must not accumulate)."""
    from multimodal_timesfm_tpu.training import evaluator as ev
    from multimodal_timesfm_tpu.training import vectorized as vz

    ev._EVAL_CACHE.clear()
    for i in range(ev._EVAL_CACHE_MAX + 3):
        decoder = _decoder()
        ev._eval_fn(decoder, HORIZON)
    assert len(ev._EVAL_CACHE) == ev._EVAL_CACHE_MAX

    vz._FUSED_CACHE.clear()
    for i in range(vz._FUSED_CACHE_MAX + 2):
        decoder = _decoder()
        vz._fused_trials_fn(decoder, "fusion", HORIZON, 1, "linear", 4, 1.0)
    assert len(vz._FUSED_CACHE) == vz._FUSED_CACHE_MAX
