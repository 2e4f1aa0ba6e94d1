"""Tests for fusion MLP and the multimodal decoder composition."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.fusion import FusionSpec, apply_fusion, init_fusion
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig


@pytest.fixture(scope="module")
def decoder():
    return MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()),
        MultimodalDecoderConfig(text_embedding_dims=6),
    )


@pytest.fixture(scope="module")
def params(decoder):
    return decoder.init(jax.random.key(0))


def test_fusion_validation():
    with pytest.raises(ValueError, match="num_layers"):
        FusionSpec(8, 4, num_layers=4, hidden_dims=(1, 2, 3))
    with pytest.raises(ValueError, match="hidden_dims"):
        FusionSpec(8, 4, num_layers=2, hidden_dims=())


def test_fusion_is_additive_and_biasfree():
    spec = FusionSpec(ts_embedding_dims=8, text_embedding_dims=4, num_layers=2, hidden_dims=(5,))
    p = init_fusion(jax.random.key(0), spec)
    assert all("bias" not in layer for layer in p["layers"])
    ts = jnp.ones((2, 3, 8))
    out_zero_text = apply_fusion(p, ts, jnp.zeros((2, 3, 4)))
    np.testing.assert_allclose(np.asarray(out_zero_text), np.asarray(ts), atol=1e-6)


def test_fusion_layer_shapes():
    spec = FusionSpec(ts_embedding_dims=8, text_embedding_dims=4, num_layers=3, hidden_dims=(5, 7))
    p = init_fusion(jax.random.key(1), spec)
    shapes = [layer["kernel"].shape for layer in p["layers"]]
    assert shapes == [(4, 5), (5, 7), (7, 8)]


def test_decoder_point_forecast_shape(decoder, params):
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    text = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 6)), jnp.float32)
    point = decoder(params, 8, x, masks, text)
    assert point.shape == (2, 8)
    full = decoder.forward_full(params, 8, x, masks, text)
    np.testing.assert_allclose(
        np.asarray(point), np.asarray(full[..., decoder.adapter.point_forecast_index])
    )


def test_decoder_baseline_path_ignores_fusion(decoder, params):
    """Without text embeddings the fusion params must not affect the output."""
    x = jnp.asarray(np.random.default_rng(2).normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    out_a = decoder(params, 8, x, masks, None)
    mutated = dict(params)
    mutated["fusion"] = jax.tree.map(lambda a: a + 100.0, params["fusion"])
    out_b = decoder(mutated, 8, x, masks, None)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b))


def test_decoder_multimodal_path_uses_fusion(decoder, params):
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    text = jnp.asarray(np.abs(np.random.default_rng(4).normal(size=(2, 4, 6))), jnp.float32)
    out_no_text = decoder(params, 8, x, masks, None)
    out_text = decoder(params, 8, x, masks, text)
    assert not np.allclose(np.asarray(out_no_text), np.asarray(out_text))


def test_decoder_mask_shape_guard(decoder, params):
    with pytest.raises(ValueError, match="masks shape"):
        decoder(params, 8, jnp.ones((2, 16)), jnp.zeros((2, 8), bool))


def test_forward_quantiles_path():
    import dataclasses

    cfg = dataclasses.replace(TimesFMConfig.tiny(), use_quantile_head=True, quantile_horizon=16)
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(cfg), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(0))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    q = decoder.forward_quantiles(params, 12, x, masks)
    assert q.shape == (2, 12, 10)
    # beyond output_patch_len (8) but within quantile_horizon (16): only this
    # head can serve horizon 12 in one shot
    with pytest.raises(ValueError, match="output_patch_len"):
        decoder.forward_full(params, 12, x, masks)

    # chronos has no quantile head method
    from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config

    cdec = MultimodalDecoder(
        Chronos2Adapter(Chronos2Config.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    with pytest.raises(NotImplementedError, match="quantile head"):
        cdec.forward_quantiles(cdec.init(jax.random.key(1)), 8, x, masks)
