"""Chronos-2 encoder wiring parity against transformers' T5EncoderModel.

The Chronos-2 encoder is a T5-style encoder-only stack (SURVEY.md §2.5:
RMSNorm pre-norm, shared relative-position bias from layer 0, ReLU FFN, no
attention scaling). transformers is installed, so the claimed design can be
verified numerically: a random T5EncoderModel's weights are mapped into our
``chronos_encoder`` params (through the converter's T5 names where they
exist) and the forward outputs must match — pinning the relative-position
bucketing, bias application, mask handling, and the RMSNorm weight
convention in one test.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")
transformers = pytest.importorskip("transformers")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_timesfm_tpu.models.chronos import (  # noqa: E402
    Chronos2Adapter,
    Chronos2Config,
    chronos_encoder,
)
from multimodal_timesfm_tpu.models.convert import CHRONOS_NAME_RULES, _convert_with_rules  # noqa: E402


@pytest.fixture(scope="module")
def oracle():
    from transformers import T5Config, T5EncoderModel

    t5cfg = T5Config(
        vocab_size=32,
        d_model=32,
        d_kv=16,
        num_heads=2,
        d_ff=64,
        num_layers=2,
        feed_forward_proj="relu",
        dropout_rate=0.0,
        relative_attention_num_buckets=32,
        relative_attention_max_distance=128,
    )
    torch.manual_seed(0)
    enc = T5EncoderModel(t5cfg).eval()
    with torch.no_grad():  # move RMSNorm weights off exact init so parity bites
        for block in enc.encoder.block:
            block.layer[0].layer_norm.weight.normal_(mean=1.0, std=0.2)
            block.layer[1].layer_norm.weight.normal_(mean=1.0, std=0.2)
        enc.encoder.final_layer_norm.weight.normal_(mean=1.0, std=0.2)
    return t5cfg, enc


@pytest.fixture(scope="module")
def converted(oracle):
    """T5 state dict -> our chronos pytree via the production converter."""
    _, enc = oracle
    sd = {k: v.detach().numpy() for k, v in enc.state_dict().items()}
    cfg = Chronos2Config(
        model_dim=32,
        num_layers=2,
        num_heads=2,
        ffn_dim=64,
        input_patch_size=4,
        output_patch_size=4,
        max_output_patches=4,
        vocab_size=32,
    )
    adapter = Chronos2Adapter(cfg)
    # T5EncoderModel carries no patch-embedding MLPs; synthesize them with
    # the expected upstream names so the strict converter can complete.
    rng = np.random.default_rng(0)
    for block, i, o in (
        ("input_patch_embedding", 3 * cfg.input_patch_size, cfg.model_dim),
        ("output_patch_embedding", cfg.model_dim, cfg.num_quantiles * cfg.output_patch_size),
    ):
        sd |= {
            f"{block}.hidden_layer.weight": rng.normal(size=(cfg.ffn_dim, i)).astype(np.float32),
            f"{block}.hidden_layer.bias": rng.normal(size=(cfg.ffn_dim,)).astype(np.float32),
            f"{block}.output_layer.weight": rng.normal(size=(o, cfg.ffn_dim)).astype(np.float32),
            f"{block}.output_layer.bias": rng.normal(size=(o,)).astype(np.float32),
            f"{block}.residual_layer.weight": rng.normal(size=(o, i)).astype(np.float32),
            f"{block}.residual_layer.bias": rng.normal(size=(o,)).astype(np.float32),
        }
    params = _convert_with_rules(sd, adapter, CHRONOS_NAME_RULES)
    return cfg, params


@pytest.mark.parametrize("with_padding", [False, True])
def test_chronos_encoder_matches_t5(oracle, converted, with_padding):
    _, enc = oracle
    cfg, params = converted
    rng = np.random.default_rng(4)
    batch, seq = 2, 12
    x = rng.normal(size=(batch, seq, cfg.model_dim)).astype(np.float32)
    mask = np.ones((batch, seq), np.float32)
    if with_padding:
        mask[1, 8:] = 0.0

    with torch.no_grad():
        expected = enc(
            inputs_embeds=torch.from_numpy(x),
            attention_mask=torch.from_numpy(mask),
        ).last_hidden_state.numpy()

    ours = np.asarray(
        chronos_encoder(params["encoder"], cfg, jnp.asarray(x), jnp.asarray(mask))
    )
    valid = mask > 0  # padded-query rows are garbage by contract on our side
    np.testing.assert_allclose(ours[valid], expected[valid], atol=3e-5)
