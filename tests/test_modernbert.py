"""ModernBERT (ruri-v3 architecture): parity vs HF transformers + interface tests."""

import numpy as np
import pytest

from multimodal_timesfm_tpu.text.modernbert import (
    ModernBertConfig,
    convert_hf_modernbert_state,
    init_modernbert,
    modernbert_encode,
)


def test_forward_parity_with_hf_modernbert():
    """Random-weight HF ModernBertModel vs our JAX stack (same weights)."""
    torch = pytest.importorskip("torch")
    try:
        from transformers import ModernBertConfig as HFConfig, ModernBertModel
    except ImportError:
        pytest.skip("transformers lacks ModernBERT")

    cfg = ModernBertConfig(
        vocab_size=128,
        hidden_size=32,
        num_layers=4,
        num_heads=2,
        intermediate_size=48,
        local_attention_window=4,
        global_attn_every_n_layers=3,
    )
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        global_attn_every_n_layers=cfg.global_attn_every_n_layers,
        local_attention=cfg.local_attention_window,
        global_rope_theta=cfg.global_rope_theta,
        local_rope_theta=cfg.local_rope_theta,
        attention_dropout=0.0,
        mlp_dropout=0.0,
        embedding_dropout=0.0,
        reference_compile=False,
        attn_implementation="eager",
        pad_token_id=0,
        bos_token_id=1,
        eos_token_id=2,
        cls_token_id=1,
        sep_token_id=2,
    )
    torch.manual_seed(0)
    hf = ModernBertModel(hf_cfg).eval()

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_modernbert_state(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 12)).astype(np.int32)
    mask = np.ones((2, 12), np.int32)
    mask[1, 8:] = 0

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state
        m = torch.from_numpy(mask).float()[..., None]
        pooled = (out * m).sum(1) / m.sum(1).clamp(min=1e-9)
        ref = torch.nn.functional.normalize(pooled, dim=-1).numpy()

    ours = np.asarray(modernbert_encode(params, cfg, ids, mask))
    np.testing.assert_allclose(ours, ref, atol=5e-5)


def test_local_attention_window_limits_reach():
    """A token outside the local window must not affect outputs in all-local stacks."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    @dataclasses.dataclass(frozen=True)
    class AllLocalConfig(ModernBertConfig):
        def is_global_layer(self, i: int) -> bool:
            return False

    cfg = AllLocalConfig(
        vocab_size=64,
        hidden_size=16,
        num_layers=2,
        num_heads=2,
        intermediate_size=32,
        local_attention_window=4,
        pooling="cls",
    )
    params = init_modernbert(jax.random.key(0), cfg)

    rng = np.random.default_rng(1)
    ids = rng.integers(0, 64, size=(1, 12)).astype(np.int32)
    mask = np.ones((1, 12), np.int32)
    ids2 = ids.copy()
    ids2[0, -1] = (ids2[0, -1] + 1) % 64  # perturb last token

    a = np.asarray(modernbert_encode(params, cfg, jnp.asarray(ids), jnp.asarray(mask)))
    b = np.asarray(modernbert_encode(params, cfg, jnp.asarray(ids2), jnp.asarray(mask)))
    # window 4 -> reach +-2 per layer; two layers reach <= 4 positions, so the
    # CLS output (position 0) cannot see a perturbation at position 11.
    np.testing.assert_allclose(a, b, atol=1e-6)

    # sanity: a global stack DOES propagate the perturbation to CLS
    g = ModernBertConfig(
        vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
        intermediate_size=32, local_attention_window=4,
        global_attn_every_n_layers=1, pooling="cls",
    )
    gp = init_modernbert(jax.random.key(0), g)
    ga = np.asarray(modernbert_encode(gp, g, jnp.asarray(ids), jnp.asarray(mask)))
    gb = np.asarray(modernbert_encode(gp, g, jnp.asarray(ids2), jnp.asarray(mask)))
    assert not np.allclose(ga, gb, atol=1e-6)


def test_japanese_encoder_interface():
    from multimodal_timesfm_tpu.text.encoders import JapaneseTextEncoder

    # tiny geometry via monkey config for speed
    enc = object.__new__(JapaneseTextEncoder)
    enc.config = ModernBertConfig.tiny()
    TextBase = JapaneseTextEncoder.__mro__[1]
    TextBase.__init__(enc, embedding_dim=16)
    out = enc(["こんにちは", "エネルギー価格"])
    assert out.shape == (2, 16)
    np.testing.assert_allclose(np.linalg.norm(out, axis=-1), 1.0, atol=1e-5)
