"""BERT-family sentence encoder in JAX (from scratch).

Architecture = standard BERT encoder (post-LN blocks, GELU FFN, learned
position + token-type embeddings), which is exactly the MiniLM-L6 geometry
that backs the reference's English sentence encoder
(``sentence-transformers/all-MiniLM-L6-v2``: 6 layers, hidden 384, 12 heads,
intermediate 1536, vocab 30522 — reference
``/root/reference/src/tsfmx/text_encoder/english.py:14``).

Sentence embedding = attention-mask-weighted mean pooling over the last
hidden states followed by L2 normalization (the model card's pooling +
Normalize modules).

Encoding is jit-compiled per (batch, seq) bucket; the tokenizer pads into
power-of-two buckets to bound recompilation.
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
class BertConfig:
    vocab_size: int = 30522
    hidden_size: int = 384
    num_layers: int = 6
    num_heads: int = 12
    intermediate_size: int = 1536
    max_position_embeddings: int = 512
    type_vocab_size: int = 2
    layer_norm_eps: float = 1e-12

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @classmethod
    def minilm_l6(cls) -> "BertConfig":
        return cls()

    @classmethod
    def tiny(cls) -> "BertConfig":
        return cls(vocab_size=128, hidden_size=16, num_layers=2, num_heads=2, intermediate_size=32)


def _normal(rng: jax.Array, shape: tuple, std: float = 0.02) -> jax.Array:
    return jax.random.normal(rng, shape) * std


def init_bert(rng: jax.Array, cfg: BertConfig) -> Params:
    keys = iter(jax.random.split(rng, 8 + 8 * cfg.num_layers))

    def dense(in_dim, out_dim):
        return {"kernel": _normal(next(keys), (in_dim, out_dim)), "bias": jnp.zeros((out_dim,))}

    def ln(dim):
        return {"scale": jnp.ones((dim,)), "bias": jnp.zeros((dim,))}

    h, i = cfg.hidden_size, cfg.intermediate_size
    params: Params = {
        "embeddings": {
            "word": _normal(next(keys), (cfg.vocab_size, h)),
            "position": _normal(next(keys), (cfg.max_position_embeddings, h)),
            "token_type": _normal(next(keys), (cfg.type_vocab_size, h)),
            "ln": ln(h),
        },
        "layers": [],
    }
    for _ in range(cfg.num_layers):
        params["layers"].append(
            {
                "q": dense(h, h),
                "k": dense(h, h),
                "v": dense(h, h),
                "attn_out": dense(h, h),
                "attn_ln": ln(h),
                "ffn_up": dense(h, i),
                "ffn_down": dense(i, h),
                "ffn_ln": ln(h),
            }
        )
    return params


def _dense(p: Params, x: jax.Array) -> jax.Array:
    return jnp.dot(x, p["kernel"], preferred_element_type=jnp.float32) + p["bias"]


def _ln(p: Params, x: jax.Array, eps: float) -> jax.Array:
    mu = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.var(x, axis=-1, keepdims=True)
    return (x - mu) * jax.lax.rsqrt(var + eps) * p["scale"] + p["bias"]


def bert_encode(
    params: Params, cfg: BertConfig, input_ids: jax.Array, attention_mask: jax.Array
) -> jax.Array:
    """(B, S) ids + mask -> (B, D) L2-normalized mean-pooled sentence embeddings.

    ``attention_mask`` uses HF polarity — int, 1 = valid token — as produced
    by the tokenizers, NOT the repo-wide bool True=padded convention of the
    time-series models. A bool mask is refused so a convention mix-up cannot
    silently invert attention (padded keys would become the only ones
    attended, and pooling would average pad embeddings).
    """
    if attention_mask.dtype == jnp.bool_:
        raise TypeError(
            "attention_mask must be the tokenizer's int mask (HF polarity, 1=valid); "
            "a bool mask suggests the repo's True=padded convention, which would be "
            "silently inverted here — convert explicitly."
        )
    b, s = input_ids.shape
    emb = params["embeddings"]
    x = (
        emb["word"][input_ids]
        + emb["position"][jnp.arange(s)][None]
        + emb["token_type"][jnp.zeros((b, s), jnp.int32)]
    )
    x = _ln(emb["ln"], x, cfg.layer_norm_eps)

    neg = jnp.finfo(jnp.float32).min
    attn_bias = jnp.where(attention_mask[:, None, None, :] > 0, 0.0, neg)

    for layer in params["layers"]:
        q = _dense(layer["q"], x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        k = _dense(layer["k"], x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        v = _dense(layer["v"], x).reshape(b, s, cfg.num_heads, cfg.head_dim)
        logits = jnp.einsum(
            "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
        ) / math.sqrt(cfg.head_dim)
        weights = jax.nn.softmax(logits + attn_bias, axis=-1)
        ctx = jnp.einsum(
            "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
        ).reshape(b, s, cfg.hidden_size)
        x = _ln(layer["attn_ln"], x + _dense(layer["attn_out"], ctx), cfg.layer_norm_eps)
        h = jax.nn.gelu(_dense(layer["ffn_up"], x), approximate=False)
        x = _ln(layer["ffn_ln"], x + _dense(layer["ffn_down"], h), cfg.layer_norm_eps)

    # mean pooling over valid tokens, then L2 normalize
    mask = attention_mask[..., None].astype(x.dtype)
    pooled = jnp.sum(x * mask, axis=1) / jnp.maximum(jnp.sum(mask, axis=1), 1e-9)
    return pooled / jnp.maximum(jnp.linalg.norm(pooled, axis=-1, keepdims=True), 1e-12)


@partial(jax.jit, static_argnums=(1,))
def bert_encode_jit(params: Params, cfg: BertConfig, input_ids: jax.Array, attention_mask: jax.Array) -> jax.Array:
    return bert_encode(params, cfg, input_ids, attention_mask)
