"""Quantile (pinball) fine-tuning — the extension that trains the quantile heads."""

import dataclasses

import jax
import numpy as np
import pytest

from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments


def _samples(n, seed, horizon=8):
    rng = np.random.default_rng(seed)
    return [
        {
            "context": rng.normal(size=16).astype(np.float32),
            "horizon": rng.normal(size=horizon).astype(np.float32),
            "text_embeddings": rng.normal(size=(4, 6)).astype(np.float32),
            "metadata": {},
        }
        for _ in range(n)
    ]


def _train(tmp_path, adapter, loss_type, mode="baseline", epochs=3):
    decoder = MultimodalDecoder(adapter, MultimodalDecoderConfig(text_embedding_dims=6))
    params = decoder.init(jax.random.key(0))
    args = TrainingArguments(
        output_dir=str(tmp_path / loss_type),
        per_device_train_batch_size=8,
        per_device_eval_batch_size=8,
        num_train_epochs=epochs,
        learning_rate=5e-3,
        eval_strategy="epoch",
        save_strategy="no",
        logging_strategy="no",
        loss_type=loss_type,
        seed=0,
    )
    trainer = MultimodalTrainer(
        decoder, params, args, _samples(24, 1), _samples(8, 2), mode
    )
    losses = [trainer.train_epoch() for _ in range(epochs)]
    return trainer, losses


@pytest.mark.parametrize(
    "adapter",
    [TimesFM2p5Adapter(TimesFMConfig.tiny()), Chronos2Adapter(Chronos2Config.tiny())],
    ids=["timesfm", "chronos"],
)
def test_quantile_training_reduces_loss(tmp_path, adapter):
    _, losses = _train(tmp_path, adapter, "quantile")
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0]


def test_quantile_loss_differs_from_mse_and_moves_quantile_channels(tmp_path):
    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    tr_q, _ = _train(tmp_path, adapter, "quantile", epochs=2)
    tr_m, _ = _train(tmp_path, adapter, "mse", epochs=2)
    a = jax.device_get(tr_q.state.trainable)
    b = jax.device_get(tr_m.state.trainable)
    diffs = jax.tree.map(lambda x, y: float(np.max(np.abs(x - y))), a, b)
    assert max(jax.tree.leaves(diffs)) > 1e-6  # objectives genuinely differ


def test_quantile_spec_validation():
    cfg = dataclasses.replace(TimesFMConfig.tiny(), quantiles=(0.1, 0.5))  # 10 channels, 2 levels
    with pytest.raises(ValueError, match="num_output_channels"):
        _ = TimesFM2p5Adapter(cfg).quantile_loss_spec
    levels, mean_ch = Chronos2Adapter(Chronos2Config.tiny()).quantile_loss_spec
    assert mean_ch is None and len(levels) == 9


def test_pinball_math_known_case(tmp_path):
    """Hand-check: constant predictions vs constant target, single level."""
    import jax.numpy as jnp

    # level 0.9, err = target - pred = 2 -> loss = 0.9*2 = 1.8
    levels = jnp.asarray([0.9])
    errs = jnp.asarray([2.0])
    pinball = jnp.maximum((levels - 1.0) * errs, levels * errs)
    np.testing.assert_allclose(np.asarray(pinball), [1.8])
    # err = -2 -> loss = (0.9-1)*(-2) = 0.2
    pinball = jnp.maximum((levels - 1.0) * -errs, levels * -errs)
    np.testing.assert_allclose(np.asarray(pinball), [0.2], atol=1e-7)
