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
