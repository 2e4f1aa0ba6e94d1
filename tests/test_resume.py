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


def _make(tmp_path, epochs):
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
