"""Unit tests for the shared sweep-trial helpers."""

import pickle

import numpy as np
import pytest

from examples.time_mmd.sweep_lib import (
    FOLD_DOMAINS,
    build_adapter,
    fold_domain_specs,
    parse_fusion_hparams,
)
from examples.time_mmd.configs.model import AdapterConfig, ModelConfig
from multimodal_timesfm_tpu.utils.tracking import _Config


def test_parse_fusion_hparams():
    assert parse_fusion_hparams(_Config({"num_fusion_layers": 1})) == (1, [])
    assert parse_fusion_hparams(
        _Config({"num_fusion_layers": 2, "fusion_hidden_dim": 512})
    ) == (2, [512])
    assert parse_fusion_hparams(
        _Config({"num_fusion_layers": 3, "fusion_hidden_dim_1": 256, "fusion_hidden_dim_2": 128})
    ) == (3, [256, 128])
    with pytest.raises(ValueError, match="fusion_hidden_dim is required"):
        parse_fusion_hparams(_Config({"num_fusion_layers": 2}))
    with pytest.raises(ValueError, match="fusion_hidden_dim_1"):
        parse_fusion_hparams(_Config({"num_fusion_layers": 3}))
    with pytest.raises(ValueError, match="between 1 and 3"):
        parse_fusion_hparams(_Config({"num_fusion_layers": 4}))
    # default is 1 layer
    assert parse_fusion_hparams(_Config({})) == (1, [])


def test_fold_domain_specs():
    train, val, test = fold_domain_specs({"train"})
    assert [s.name for s in train] == [f"{d}_train" for d in FOLD_DOMAINS]
    assert all(s.augment for s in train)
    assert not any(s.augment for s in val)
    assert [s.name for s in test] == [f"{d}_test" for d in FOLD_DOMAINS]


def test_build_adapter_patch_len_guard():
    cfg = ModelConfig(adapter=AdapterConfig(type="timesfm", patch_len=16))  # real is 32
    with pytest.raises(ValueError, match="does not match"):
        build_adapter(cfg, None)
    with pytest.raises(NotImplementedError):
        build_adapter(ModelConfig(adapter=AdapterConfig(type="nope", patch_len=1)), None)


def test_load_fold_datasets(tmp_path):
    from examples.time_mmd.cross_validation import DomainSpec, load_fold_datasets
    from multimodal_timesfm_tpu.data.preprocess import PreprocessPipeline

    pipeline = PreprocessPipeline(tmp_path)
    rng = np.random.default_rng(0)
    for name in ["A_train", "A_val", "A_test"]:
        samples = [
            {
                "context": rng.normal(size=8).astype(np.float32),
                "horizon": rng.normal(size=4).astype(np.float32),
                "text_embeddings": rng.normal(size=(2, 6)).astype(np.float32),
                "metadata": {},
            }
            for _ in range(3)
        ]
        path = pipeline.get_path("time_mmd", name, "english", 4, 8, 4)
        with open(path, "wb") as f:
            pickle.dump(samples, f)

    train, val, test = load_fold_datasets(
        [DomainSpec("A_train")], [DomainSpec("A_val")], [DomainSpec("A_test")],
        text_encoder_type="english", patch_len=4, context_len=8, horizon_len=4,
        cache_dir=tmp_path,
    )
    assert len(train) == len(val) == len(test) == 3
    assert train[0]["context"].shape == (8,)
