"""Checkpoint backends: pickle (default) and orbax directory checkpoints."""

import numpy as np
import pytest

from multimodal_timesfm_tpu.training.checkpoint import (
    load_checkpoint,
    rotate_checkpoints,
    save_checkpoint,
)


def _payload():
    return {
        "epoch": 3,
        "global_step": 42,
        "best_val_loss": 0.5,
        "fusion_params": {"layers": [{"kernel": np.arange(6.0).reshape(2, 3)}]},
    }


def test_pickle_roundtrip(tmp_path):
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, _payload())
    restored = load_checkpoint(path)
    assert restored["epoch"] == 3
    np.testing.assert_array_equal(
        restored["fusion_params"]["layers"][0]["kernel"], np.arange(6.0).reshape(2, 3)
    )


def test_pickle_atomic_overwrite(tmp_path):
    path = tmp_path / "ck.ckpt"
    save_checkpoint(path, _payload())
    p2 = _payload()
    p2["epoch"] = 9
    save_checkpoint(path, p2)
    assert load_checkpoint(path)["epoch"] == 9
    assert not path.with_suffix(".ckpt.tmp").exists()


def test_orbax_roundtrip(tmp_path):
    pytest.importorskip("orbax.checkpoint")
    path = tmp_path / "ck_orbax"
    save_checkpoint(path, _payload(), backend="orbax")
    assert path.is_dir()
    restored = load_checkpoint(path)
    np.testing.assert_array_equal(
        np.asarray(restored["fusion_params"]["layers"][0]["kernel"]),
        np.arange(6.0).reshape(2, 3),
    )
    # overwrite works
    p2 = _payload()
    p2["global_step"] = 100
    save_checkpoint(path, p2, backend="orbax")
    assert int(np.asarray(load_checkpoint(path)["global_step"])) == 100


def test_rotation(tmp_path):
    for e in range(5):
        save_checkpoint(tmp_path / f"checkpoint_epoch_{e}.ckpt", {"epoch": e})
    rotate_checkpoints(tmp_path, 2)
    remaining = sorted(p.name for p in tmp_path.glob("checkpoint_epoch_*.ckpt"))
    assert remaining == ["checkpoint_epoch_3.ckpt", "checkpoint_epoch_4.ckpt"]


def test_trainer_with_orbax_backend(tmp_path):
    """End-to-end: trainer saves/rotates orbax directory checkpoints."""
    pytest.importorskip("orbax.checkpoint")
    import jax

    from multimodal_timesfm_tpu.models.decoder import (
        MultimodalDecoder,
        MultimodalDecoderConfig,
    )
    from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
    from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
    from multimodal_timesfm_tpu.training_args import TrainingArguments
    from multimodal_timesfm_tpu.types import PreprocessedSample

    rng = np.random.default_rng(0)
    samples = [
        PreprocessedSample(
            context=rng.normal(size=16).astype(np.float32),
            horizon=rng.normal(size=8).astype(np.float32),
            metadata={},
        )
        for _ in range(12)
    ]
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    trainer = MultimodalTrainer(
        model=decoder,
        params=decoder.init(jax.random.key(0)),
        args=TrainingArguments(
            output_dir=str(tmp_path / "out"),
            per_device_train_batch_size=8,
            num_train_epochs=3,
            eval_strategy="epoch",
            save_strategy="epoch",
            save_total_limit=1,
            logging_strategy="no",
            seed=0,
        ),
        train_dataset=samples,
        val_dataset=samples[:8],
        mode="baseline",
        ckpt_backend="orbax",
    )
    trainer.train()
    ckpt_dirs = list(trainer.args.checkpoint_dir.glob("checkpoint_epoch_*.ckpt"))
    assert len(ckpt_dirs) == 1 and ckpt_dirs[0].is_dir()  # rotated directories
    best = trainer.args.checkpoint_dir / "best_model.ckpt"
    assert best.is_dir()
    restored = load_checkpoint(best)
    assert "adapter_params" in restored


def test_rotation_limit_zero_deletes_all(tmp_path):
    """save_total_limit=0 must delete every epoch checkpoint (the [:-0] slice
    idiom previously kept them all — review finding)."""
    for e in range(3):
        save_checkpoint(tmp_path / f"checkpoint_epoch_{e}.ckpt", {"epoch": e})
    rotate_checkpoints(tmp_path, 0)
    assert list(tmp_path.glob("checkpoint_epoch_*.ckpt")) == []


def test_orbax_failed_save_preserves_existing(tmp_path, monkeypatch):
    """A save that dies mid-write must not destroy the existing checkpoint:
    the old copy is only removed after the new one is fully written (review
    finding: delete-then-save lost both copies)."""
    ocp = pytest.importorskip("orbax.checkpoint")
    path = tmp_path / "ck_orbax"
    save_checkpoint(path, _payload(), backend="orbax")

    def boom(self, *a, **k):
        raise RuntimeError("disk full")

    monkeypatch.setattr(ocp.StandardCheckpointer, "save", boom)
    with pytest.raises(RuntimeError, match="disk full"):
        save_checkpoint(path, {"epoch": 9}, backend="orbax")
    assert int(np.asarray(load_checkpoint(path)["epoch"])) == 3  # old copy intact


def test_restructure_like_rebuilds_optax_state():
    """restructure_like turns orbax's plain containers back into the optax
    namedtuple structure, matching fields BY NAME."""
    import jax
    import jax.numpy as jnp
    import optax

    from multimodal_timesfm_tpu.training.checkpoint import restructure_like

    params = {"w": jnp.ones((2, 3)), "b": jnp.zeros((3,))}
    opt = optax.chain(optax.clip_by_global_norm(1.0), optax.adamw(1e-3))
    template = jax.device_get(opt.init(params))

    # what an orbax target-less restore produces: namedtuples -> dicts,
    # tuples -> lists, empty states -> None
    def plainify(node):
        if node is None:
            return None
        if isinstance(node, tuple) and hasattr(node, "_fields"):
            if not node._fields:
                return None
            return {f: plainify(getattr(node, f)) for f in node._fields}
        if isinstance(node, (list, tuple)):
            return [plainify(x) for x in node]
        if isinstance(node, dict):
            return {k: plainify(v) for k, v in node.items()}
        return np.asarray(node)

    rebuilt = restructure_like(template, plainify(template))
    assert jax.tree.structure(rebuilt) == jax.tree.structure(template)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(a, b), rebuilt, template)


def test_trainer_orbax_resume_roundtrip(tmp_path):
    """Mid-run resume from an ORBAX checkpoint restores a usable optimizer
    state (review finding: target-less orbax restore returned plain dicts and
    the first optimizer.update crashed)."""
    pytest.importorskip("orbax.checkpoint")
    import jax

    from multimodal_timesfm_tpu.models.decoder import (
        MultimodalDecoder,
        MultimodalDecoderConfig,
    )
    from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
    from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
    from multimodal_timesfm_tpu.training_args import TrainingArguments
    from multimodal_timesfm_tpu.types import PreprocessedSample

    rng = np.random.default_rng(0)
    samples = [
        PreprocessedSample(
            context=rng.normal(size=16).astype(np.float32),
            horizon=rng.normal(size=8).astype(np.float32),
            metadata={},
        )
        for _ in range(12)
    ]
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )

    def make_trainer(out):
        return MultimodalTrainer(
            model=decoder,
            params=decoder.init(jax.random.key(0)),
            args=TrainingArguments(
                output_dir=str(out),
                per_device_train_batch_size=8,
                num_train_epochs=2,
                eval_strategy="epoch",
                save_strategy="epoch",
                logging_strategy="no",
                seed=0,
            ),
            train_dataset=samples,
            val_dataset=samples[:8],
            mode="baseline",
            ckpt_backend="orbax",
            fuse_epochs=False,
        )

    t1 = make_trainer(tmp_path / "a")
    t1.train()
    ckpt = sorted(t1.args.checkpoint_dir.glob("checkpoint_epoch_*.ckpt"))[-1]

    t2 = make_trainer(tmp_path / "b")
    t2.resume_from_checkpoint(ckpt)
    assert t2.start_epoch == 2 and t2.global_step == t1.global_step
    # the restored opt state must be structurally identical to a fresh init
    assert jax.tree.structure(t2.state.opt_state) == jax.tree.structure(t1.state.opt_state)
    # ...and actually usable: one more epoch of training steps the optimizer
    loss = t2.train_epoch()
    assert np.isfinite(loss)
