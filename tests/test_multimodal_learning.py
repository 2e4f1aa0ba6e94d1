"""Functional capstone: the fusion path actually extracts signal from text.

Targets depend on a latent sign visible ONLY in the text embeddings: a
baseline model cannot beat the sign-blind MSE floor (~1), while multimodal
fusion training learns to read the sign. This exercises the framework's core
premise end-to-end (preprocess -> fusion injection -> transformer -> loss ->
fusion-only updates).
"""

import tempfile

import jax
import numpy as np

from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.evaluator import MultimodalEvaluator
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import PreprocessedSample

RNG = np.random.default_rng(0)


def _make(n):
    out = []
    for _ in range(n):
        z = RNG.choice([-1.0, 1.0])
        out.append(
            PreprocessedSample(
                context=(RNG.normal(size=16) * 0.1).astype(np.float32),
                horizon=(np.full(8, z) + RNG.normal(size=8) * 0.05).astype(np.float32),
                text_embeddings=(
                    np.tile([z, 0, 0, 0, 0, 0], (4, 1)) + RNG.normal(size=(4, 6)) * 0.05
                ).astype(np.float32),
                metadata={},
            )
        )
    return out


def _train_and_eval(mode, train, test, epochs=35, lr=2e-2):
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(0))
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=TrainingArguments(
            output_dir=tempfile.mkdtemp(),
            per_device_train_batch_size=16,
            num_train_epochs=epochs,
            learning_rate=lr,
            eval_strategy="epoch",
            save_strategy="no",
            logging_strategy="no",
            seed=0,
        ),
        train_dataset=train,
        val_dataset=test,
        mode=mode,
    )
    for _ in range(epochs):
        trainer.train_epoch()
    evaluator = MultimodalEvaluator(decoder)
    return evaluator.evaluate(
        trainer.params, test, batch_size=16, multimodal=mode == "multimodal"
    )["mse"]


def test_fusion_learns_text_signal():
    train, test = _make(64), _make(32)
    multimodal_mse = _train_and_eval("multimodal", train, test)
    baseline_mse = _train_and_eval("baseline", train, test)
    # sign-blind floor is ~1.0; fusion must land below it and beat baseline
    assert multimodal_mse < 1.0 + 0.2, multimodal_mse
    assert multimodal_mse < 0.7 * baseline_mse, (multimodal_mse, baseline_mse)
