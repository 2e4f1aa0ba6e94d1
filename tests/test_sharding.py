"""Sharding rules: spec assignment + tensor-parallel numerical equivalence."""

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh
from multimodal_timesfm_tpu.parallel.sharding import param_specs, shard_params
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import PreprocessedSample


def _decoder():
    return MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )


def test_param_specs_assignment():
    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    specs = param_specs(params)

    sx = specs["adapter"]["stacked_xf"]
    assert sx["ffn_up"]["kernel"] == P(None, None, "model")
    assert sx["ffn_up"]["bias"] == P(None, "model")
    assert sx["ffn_down"]["kernel"] == P(None, "model", None)
    assert sx["ffn_down"]["bias"] == P()
    # fused qkv is replicated: its q/k/v slice boundaries only align with
    # shard boundaries when mp % 3 == 0, so column-sharding it forces a
    # per-layer all-gather of the qkv activation (review finding r3-late)
    assert sx["attn"]["qkv"]["kernel"] == P()
    assert sx["attn"]["out"]["kernel"] == P(None, "model", None)
    assert sx["attn"]["per_dim_scale"] == P()
    assert sx["attn_norm"]["scale"] == P()

    tok = specs["adapter"]["tokenizer"]
    assert tok["hidden"]["kernel"] == P(None, "model")
    assert tok["output"]["kernel"] == P("model", None)
    assert tok["residual"]["kernel"] == P()

    # fusion stays replicated
    for layer in specs["fusion"]["layers"]:
        assert layer["kernel"] == P()


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


@pytest.mark.parametrize("mp", [2, 4])
def test_tensor_parallel_training_matches_single_device(tmp_path, mp):
    """One epoch on a (dp=2, mp) mesh must match the unsharded run numerically."""
    samples = _samples(16, 0)

    def run(mesh, shard_fn):
        decoder = _decoder()
        params = decoder.init(jax.random.key(1))
        trainer = MultimodalTrainer(
            model=decoder,
            params=params,
            args=TrainingArguments(
                output_dir=str(tmp_path / f"out{mp}_{mesh is None}"),
                per_device_train_batch_size=8,
                num_train_epochs=1,
                learning_rate=1e-2,
                eval_strategy="epoch",
                save_strategy="no",
                logging_strategy="no",
                seed=7,
            ),
            train_dataset=samples,
            val_dataset=samples[:8],
            mode="baseline",
            mesh=mesh,
            shard_params_fn=shard_fn,
        )
        trainer.train_epoch()
        return jax.device_get(trainer.state.trainable), trainer.validate_epoch()

    ref_params, ref_val = run(None, None)
    mesh = make_mesh(MeshConfig(data_parallel=8 // mp, model_parallel=mp))
    tp_params, tp_val = run(mesh, shard_params)

    # Loose param tolerance: Adam's first-step update amplifies sharded-
    # reduction fp noise on near-zero gradient entries; the val-loss check
    # below pins functional equivalence tightly.
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, atol=5e-3), ref_params, tp_params
    )
    np.testing.assert_allclose(ref_val, tp_val, atol=1e-4)


def test_chronos_tensor_parallel_matches_single_device(tmp_path):
    """Chronos backbone TP on a (2,4) mesh matches the unsharded run."""
    from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config

    samples = _samples(16, 2)

    def run(mesh, shard_fn):
        decoder = MultimodalDecoder(
            Chronos2Adapter(Chronos2Config.tiny()),
            MultimodalDecoderConfig(text_embedding_dims=6),
        )
        params = decoder.init(jax.random.key(4))
        trainer = MultimodalTrainer(
            model=decoder,
            params=params,
            args=TrainingArguments(
                output_dir=str(tmp_path / f"c{mesh is None}"),
                per_device_train_batch_size=8,
                num_train_epochs=1,
                learning_rate=1e-2,
                eval_strategy="epoch",
                save_strategy="no",
                logging_strategy="no",
                seed=9,
            ),
            train_dataset=samples,
            val_dataset=samples[:8],
            mode="baseline",
            mesh=mesh,
            shard_params_fn=shard_fn,
        )
        trainer.train_epoch()
        return trainer.validate_epoch()

    ref_val = run(None, None)
    mesh = make_mesh(MeshConfig(data_parallel=2, model_parallel=4))
    tp_val = run(mesh, shard_params)
    np.testing.assert_allclose(ref_val, tp_val, atol=1e-4)
