"""Numerical parity: JAX implementation vs the independent torch mirror.

These pin the JAX forward math (running stats, RevIN, tokenizer, transformer
stack, output head, fusion) to a torch implementation within fp32 tolerance —
the SURVEY.md §7 parity strategy, executable in a zero-egress environment.
"""

import jax
import jax.numpy as jnp
import numpy as np
import torch

from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.fusion import FusionSpec, apply_fusion, init_fusion
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig

from tests.torch_reference import TorchFusion, TorchTimesFM, load_jax_fusion, load_jax_params

torch.manual_seed(0)

CFG = TimesFMConfig(
    input_patch_len=4,
    output_patch_len=8,
    model_dims=32,
    ffn_dims=48,
    num_layers=3,
    num_heads=4,
)


def _build():
    adapter = TimesFM2p5Adapter(CFG)
    params = adapter.init(jax.random.key(0))
    tmodel = TorchTimesFM(
        patch_len=CFG.input_patch_len,
        output_patch_len=CFG.output_patch_len,
        model_dims=CFG.model_dims,
        ffn_dims=CFG.ffn_dims,
        num_layers=CFG.num_layers,
        num_heads=CFG.num_heads,
    )
    load_jax_params(tmodel, jax.device_get(params))
    return adapter, params, tmodel


def test_full_forward_parity():
    adapter, params, tmodel = _build()
    rng = np.random.default_rng(0)
    x = rng.normal(size=(3, 16)).astype(np.float32) * 2 + 1
    masks = np.zeros((3, 16), bool)
    masks[0, :4] = True  # one sample with a padded first patch

    pre = adapter.preprocess(params, jnp.asarray(x), jnp.asarray(masks))
    out = adapter.forward(params, pre.input_embeddings, pre.masks)
    jax_preds = np.asarray(adapter.postprocess(params, 8, out, pre.normalization_stats))

    with torch.no_grad():
        torch_preds = tmodel(8, torch.from_numpy(x), torch.from_numpy(masks)).numpy()

    np.testing.assert_allclose(jax_preds, torch_preds, atol=2e-4, rtol=1e-3)


def test_multimodal_forward_parity():
    adapter, params, tmodel = _build()
    decoder = MultimodalDecoder(adapter, MultimodalDecoderConfig(text_embedding_dims=12))
    dec_params = {"adapter": params, "fusion": init_fusion(
        jax.random.key(7), decoder.fusion_spec
    )}

    tfusion = TorchFusion(12, CFG.model_dims)
    load_jax_fusion(tfusion, jax.device_get(dec_params["fusion"]))

    rng = np.random.default_rng(1)
    x = rng.normal(size=(2, 16)).astype(np.float32)
    masks = np.zeros((2, 16), bool)
    text = rng.normal(size=(2, 4, 12)).astype(np.float32)

    jax_point = np.asarray(
        decoder(dec_params, 8, jnp.asarray(x), jnp.asarray(masks), jnp.asarray(text))
    )
    with torch.no_grad():
        torch_full = tmodel(
            8, torch.from_numpy(x), torch.from_numpy(masks), torch.from_numpy(text), tfusion
        )
        torch_point = torch_full[..., CFG.decode_index].numpy()

    np.testing.assert_allclose(jax_point, torch_point, atol=2e-4, rtol=1e-3)


def test_fusion_parity():
    spec = FusionSpec(ts_embedding_dims=16, text_embedding_dims=8, num_layers=2, hidden_dims=(10,))
    p = init_fusion(jax.random.key(3), spec)
    tfusion = TorchFusion(8, 16, hidden_dims=(10,))
    load_jax_fusion(tfusion, jax.device_get(p))

    rng = np.random.default_rng(2)
    text = rng.normal(size=(2, 4, 8)).astype(np.float32)
    ts = np.zeros((2, 4, 16), np.float32)
    jax_out = np.asarray(apply_fusion(p, jnp.asarray(ts), jnp.asarray(text)))
    with torch.no_grad():
        torch_out = tfusion(torch.from_numpy(text)).numpy()
    np.testing.assert_allclose(jax_out, torch_out, atol=1e-5)
