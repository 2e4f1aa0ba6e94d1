"""ModernBERT encoder in JAX — the architecture behind ruri-v3 Japanese embeddings.

The reference's Japanese sentence encoder is ``cl-nagoya/ruri-v3-310m``
(``/root/reference/src/tsfmx/text_encoder/japanese.py:15-17``), built on
ModernBERT-ja-310m. ModernBERT differs from classic BERT: RoPE instead of
learned positions, pre-norm bias-free LayerNorms (layer 0 skips the
attention norm), GeGLU FFN, and alternating local (sliding-window) / global
attention with different RoPE thetas.

310M-geometry defaults: hidden 768, 25 layers, 12 heads, GeGLU intermediate
3072, vocab 102400, global attention every 3rd layer, 128-token local
window, theta 160k (global) / 10k (local).

Sentence embedding = masked mean pooling + L2 norm (matching the
SentenceTransformer pooling contract used by the reference; configurable to
CLS pooling via ``pooling="cls"``).
"""

from __future__ import annotations

import dataclasses
import math
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]


@dataclasses.dataclass(frozen=True)
class ModernBertConfig:
    vocab_size: int = 102400
    hidden_size: int = 768
    num_layers: int = 25
    num_heads: int = 12
    intermediate_size: int = 3072  # GeGLU: Wi projects to 2x this
    global_attn_every_n_layers: int = 3
    local_attention_window: int = 128
    global_rope_theta: float = 160000.0
    local_rope_theta: float = 10000.0
    layer_norm_eps: float = 1e-5
    pooling: str = "mean"  # or "cls"

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    def is_global_layer(self, i: int) -> bool:
        return i % self.global_attn_every_n_layers == 0

    @classmethod
    def ruri_v3_310m(cls) -> "ModernBertConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "ModernBertConfig":
        return cls(
            vocab_size=128,
            hidden_size=16,
            num_layers=4,
            num_heads=2,
            intermediate_size=32,
            local_attention_window=4,
        )


def _normal(rng: jax.Array, shape: tuple, std: float = 0.02) -> jax.Array:
    return jax.random.normal(rng, shape) * std


def init_modernbert(rng: jax.Array, cfg: ModernBertConfig) -> Params:
    keys = iter(jax.random.split(rng, 2 + 4 * cfg.num_layers))
    h, i2 = cfg.hidden_size, cfg.intermediate_size
    params: Params = {
        "embeddings": {
            "word": _normal(next(keys), (cfg.vocab_size, h)),
            "norm": {"scale": jnp.ones((h,))},
        },
        "layers": [],
        "final_norm": {"scale": jnp.ones((h,))},
    }
    for layer_idx in range(cfg.num_layers):
        layer: Params = {
            "wqkv": {"kernel": _normal(next(keys), (h, 3 * h))},
            "wo": {"kernel": _normal(next(keys), (h, h))},
            "mlp_norm": {"scale": jnp.ones((h,))},
            "mlp_wi": {"kernel": _normal(next(keys), (h, 2 * i2))},
            "mlp_wo": {"kernel": _normal(jax.random.fold_in(next(keys), 1), (i2, h))},
        }
        if layer_idx > 0:  # layer 0 has no attention norm (embedding norm suffices)
            layer["attn_norm"] = {"scale": jnp.ones((h,))}
        params["layers"].append(layer)
    return params


def _ln(p: Params, x: jax.Array, eps: float) -> jax.Array:
    """Bias-free LayerNorm."""
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"]


def _rope(x: jax.Array, theta: float) -> jax.Array:
    """Rotary position embedding over (B, S, H, D)."""
    _, seq, _, dim = x.shape
    half = dim // 2
    freqs = 1.0 / (theta ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    angles = jnp.arange(seq, dtype=jnp.float32)[:, None] * freqs[None, :]  # (S, half)
    cos = jnp.cos(angles)[None, :, None, :]
    sin = jnp.sin(angles)[None, :, None, :]
    x1, x2 = x[..., :half], x[..., half:]
    return jnp.concatenate([x1 * cos - x2 * sin, x2 * cos + x1 * sin], axis=-1)


def modernbert_encode(
    params: Params, cfg: ModernBertConfig, input_ids: jax.Array, attention_mask: jax.Array
) -> jax.Array:
    """(B, S) ids + mask -> (B, D) L2-normalized sentence embeddings.

    ``attention_mask`` uses HF polarity — int, 1 = valid token — as produced
    by the tokenizers, NOT the repo-wide bool True=padded convention of the
    time-series models (the encoders are self-contained: mask produced and
    consumed inside ``TextEncoderBase.encode``). A bool mask is refused so a
    convention mix-up cannot silently invert attention.
    """
    if attention_mask.dtype == jnp.bool_:
        raise TypeError(
            "attention_mask must be the tokenizer's int mask (HF polarity, 1=valid); "
            "a bool mask suggests the repo's True=padded convention, which would be "
            "silently inverted here — convert explicitly."
        )
    b, s = input_ids.shape
    x = params["embeddings"]["word"][input_ids]
    x = _ln(params["embeddings"]["norm"], x, cfg.layer_norm_eps)

    neg = jnp.finfo(jnp.float32).min
    key_valid = attention_mask[:, None, None, :] > 0  # (B, 1, 1, S)
    pos = jnp.arange(s)
    dist = jnp.abs(pos[:, None] - pos[None, :])
    local_ok = dist <= cfg.local_attention_window // 2  # (S, S)

    for layer_idx, layer in enumerate(params["layers"]):
        is_global = cfg.is_global_layer(layer_idx)
        theta = cfg.global_rope_theta if is_global else cfg.local_rope_theta

        h = _ln(layer["attn_norm"], x, cfg.layer_norm_eps) if "attn_norm" in layer else x
        qkv = jnp.dot(h, layer["wqkv"]["kernel"], preferred_element_type=jnp.float32)
        qkv = qkv.reshape(b, s, 3, cfg.num_heads, cfg.head_dim)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = _rope(q, theta)
        k = _rope(k, theta)

        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(cfg.head_dim)
        allowed = key_valid if is_global else key_valid & local_ok[None, None]
        logits = jnp.where(allowed, logits, neg)
        weights = jax.nn.softmax(logits, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
        ).reshape(b, s, cfg.hidden_size)
        x = x + jnp.dot(ctx, layer["wo"]["kernel"], preferred_element_type=jnp.float32)

        h = _ln(layer["mlp_norm"], x, cfg.layer_norm_eps)
        wi = jnp.dot(h, layer["mlp_wi"]["kernel"], preferred_element_type=jnp.float32)
        inp, gate = jnp.split(wi, 2, axis=-1)
        h = jax.nn.gelu(inp, approximate=False) * gate
        x = x + jnp.dot(h, layer["mlp_wo"]["kernel"], preferred_element_type=jnp.float32)

    x = _ln(params["final_norm"], x, cfg.layer_norm_eps)

    if cfg.pooling == "cls":
        pooled = x[:, 0]
    else:
        mask = attention_mask[..., None].astype(x.dtype)
        pooled = jnp.sum(x * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnums=(1,))
def modernbert_encode_jit(params: Params, cfg: ModernBertConfig, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
    """Jitted encode (cfg is frozen/hashable, so it keys the trace): the cache
    build embeds thousands of texts through 25 layers — eagerly that is
    hundreds of per-op dispatches per batch."""
    return modernbert_encode(params, cfg, input_ids, attention_mask)


def convert_hf_modernbert_state(sd: dict, cfg: ModernBertConfig) -> Params:
    """Map HF ModernBERT parameter names to this pytree (torch (out,in) -> (in,out))."""
    if any(k.startswith("model.") for k in sd):
        sd = {k.removeprefix("model."): v for k, v in sd.items()}

    def kernel(name):
        return {"kernel": jnp.asarray(sd[name]).T}

    params: Params = {
        "embeddings": {
            "word": jnp.asarray(sd["embeddings.tok_embeddings.weight"]),
            "norm": {"scale": jnp.asarray(sd["embeddings.norm.weight"])},
        },
        "layers": [],
        "final_norm": {"scale": jnp.asarray(sd["final_norm.weight"])},
    }
    for i in range(cfg.num_layers):
        base = f"layers.{i}"
        layer: Params = {
            "wqkv": kernel(f"{base}.attn.Wqkv.weight"),
            "wo": kernel(f"{base}.attn.Wo.weight"),
            "mlp_norm": {"scale": jnp.asarray(sd[f"{base}.mlp_norm.weight"])},
            "mlp_wi": kernel(f"{base}.mlp.Wi.weight"),
            "mlp_wo": kernel(f"{base}.mlp.Wo.weight"),
        }
        if i > 0:
            layer["attn_norm"] = {"scale": jnp.asarray(sd[f"{base}.attn_norm.weight"])}
        params["layers"].append(layer)
    return params
