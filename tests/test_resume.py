"""Mid-run resume: interrupted training continues with restored state."""

import jax
import numpy as np

from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import PreprocessedSample


def _samples(n, seed):
    rng = np.random.default_rng(seed)
    return [
        PreprocessedSample(
            context=rng.normal(size=16).astype(np.float32),
            horizon=rng.normal(size=8).astype(np.float32),
            metadata={},
        )
        for _ in range(n)
    ]


def _make(tmp_path, epochs, fused_optimizer=False):
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(0))
    args = TrainingArguments(
        output_dir=str(tmp_path / "out"),
        per_device_train_batch_size=8,
        per_device_eval_batch_size=8,
        num_train_epochs=epochs,
        learning_rate=1e-2,
        eval_strategy="epoch",
        save_strategy="epoch",
        logging_strategy="no",
        seed=0,
    )
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=args,
        train_dataset=_samples(16, 0),
        val_dataset=_samples(8, 1),
        mode="baseline",
        fused_optimizer=fused_optimizer,
    )
    return trainer


def test_resume_restores_counters_and_state(tmp_path):
    t1 = _make(tmp_path, epochs=2)
    t1.train()
    assert t1.current_epoch == 1
    ckpt_path = t1.args.checkpoint_dir / "checkpoint_epoch_1.ckpt"
    assert ckpt_path.exists()

    t2 = _make(tmp_path, epochs=4)
    t2.resume_from_checkpoint(ckpt_path)
    assert t2.start_epoch == 2
    assert t2.global_step == t1.global_step
    assert t2.best_val_loss == t1.best_val_loss

    # restored params match the checkpointed ones
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        jax.device_get(t2.state.trainable),
        jax.device_get(t1.state.trainable),
    )

    t2.train()  # continues epochs 2..3 without error
    assert t2.current_epoch == 3


def test_resume_rejects_optimizer_kind_mismatch(tmp_path):
    """fused vs chain store structurally different opt_state trees; resuming
    across the boundary must fail with an error naming fused_optimizer, not
    an opaque pytree-restructure error (advisor finding r4)."""
    import pytest

    t1 = _make(tmp_path, epochs=1)  # chain optimizer
    t1.train()
    ckpt = t1.args.checkpoint_dir / "checkpoint_epoch_0.ckpt"

    t2 = _make(tmp_path, epochs=2, fused_optimizer=True)
    with pytest.raises(ValueError, match="fused_optimizer"):
        t2.resume_from_checkpoint(ckpt)

    # Same-kind resume still works for the fused path round-trip.
    t3 = _make(tmp_path / "f", epochs=1, fused_optimizer=True)
    t3.train()
    fused_ckpt = t3.args.checkpoint_dir / "checkpoint_epoch_0.ckpt"
    t4 = _make(tmp_path / "f", epochs=2, fused_optimizer=True)
    t4.resume_from_checkpoint(fused_ckpt)
    assert t4.start_epoch == 1
    with pytest.raises(ValueError, match="fused_optimizer"):
        _make(tmp_path / "f", epochs=2).resume_from_checkpoint(fused_ckpt)


def test_resume_preserves_tensor_parallel_sharding(tmp_path):
    """Checkpoint restore re-applies shard_params_fn: falling back to
    replicated would silently multiply per-device HBM by model_parallel and
    recompile without TP (review finding)."""
    from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh
    from multimodal_timesfm_tpu.parallel.sharding import shard_params

    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))

    def make(out):
        decoder = MultimodalDecoder(
            TimesFM2p5Adapter(TimesFMConfig.tiny()),
            MultimodalDecoderConfig(text_embedding_dims=6),
        )
        args = TrainingArguments(
            output_dir=str(out),
            per_device_train_batch_size=8,
            per_device_eval_batch_size=8,
            num_train_epochs=1,
            eval_strategy="epoch",
            save_strategy="epoch",
            logging_strategy="no",
            seed=0,
        )
        return MultimodalTrainer(
            model=decoder,
            params=decoder.init(jax.random.key(0)),
            args=args,
            train_dataset=_samples(16, 0),
            val_dataset=_samples(8, 1),
            mode="baseline",
            mesh=mesh,
            shard_params_fn=shard_params,
        )

    t1 = make(tmp_path / "a")
    sharded_spec = t1.state.trainable["stacked_xf"]["ffn_up"]["kernel"].sharding.spec
    assert "model" in str(sharded_spec)  # TP actually applied at init
    t1.train()
    ckpt = t1.args.checkpoint_dir / "checkpoint_epoch_0.ckpt"

    t2 = make(tmp_path / "b")
    t2.resume_from_checkpoint(ckpt)
    restored = t2.state.trainable["stacked_xf"]["ffn_up"]["kernel"]
    assert restored.sharding.spec == sharded_spec, restored.sharding
    # optimizer moments keep the TP placement too
    mu_leaves = [
        leaf
        for leaf in jax.tree.leaves(t2.state.opt_state)
        if hasattr(leaf, "sharding") and getattr(leaf, "ndim", 0) >= 2
    ]
    assert any("model" in str(leaf.sharding.spec) for leaf in mu_leaves)
    # ...and training continues
    loss = t2.train_epoch()
    assert np.isfinite(loss)


def test_save_strategy_steps_warns(tmp_path, caplog):
    """save_strategy='steps' (the parity default) writes nothing in the
    reference either — train() must warn instead of silently losing the
    run's checkpoints (review finding)."""
    import logging

    t = _make(tmp_path, epochs=1)
    object.__setattr__(t.args, "save_strategy", "steps")
    with caplog.at_level(logging.WARNING):
        t.train()
    assert any("NO checkpoints" in rec.getMessage() for rec in caplog.records)
    assert not list(t.args.checkpoint_dir.glob("*.ckpt"))


def test_make_mesh_rejects_bad_model_parallel():
    import pytest

    from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh

    with pytest.raises(ValueError, match="model_parallel"):
        make_mesh(MeshConfig(model_parallel=0))
    with pytest.raises(ValueError, match="model_parallel"):
        make_mesh(MeshConfig(model_parallel=-1))
    with pytest.raises(ValueError, match="does not match"):
        make_mesh(MeshConfig(data_parallel=3, model_parallel=2))
