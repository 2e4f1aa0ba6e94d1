"""Fused causal attention: Pallas TPU kernel with an XLA fallback.

The TimesFM patch-token sequences are short (context//patch_len tokens:
1 for the default 32/32 workload, up to 512 for 16k contexts), so the win is
not FlashAttention asymptotics but *fusion*: one kernel computes
``softmax(QK^T + masks) V`` entirely in VMEM, avoiding the HBM round-trip of
the (S, S) logits/weights tensors that the unfused XLA path materializes.

Design:
  * whole-sequence kernel (S fits VMEM for S <= 2048 at TSFM head dims),
    grid over (batch * heads); no online softmax needed,
  * causal + key-padding masks computed in-kernel with broadcasted iota,
  * backward pass: custom_vjp whose bwd re-computes attention with the plain
    XLA implementation and takes its VJP — forward gets kernel fusion,
    backward gets XLA's fused autodiff (a hand-written Pallas backward is a
    planned optimization),
  * ``interpret=True`` path for CPU tests.

Used by ``models/layers.causal_attention`` when the sequence/tiling
constraints hold; falls back to XLA otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def xla_causal_attention(q, k, v, key_valid):
    """Reference XLA implementation.

    Args:
        q, k, v: (B, S, H, D); q pre-scaled.
        key_valid: (B, S) bool, True = valid key.

    Returns:
        (B, S, H, D).
    """
    seq = q.shape[1]
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    causal = jnp.tril(jnp.ones((seq, seq), bool))
    mask = causal[None, None, :, :] & key_valid[:, None, None, :]
    logits = jnp.where(mask, logits, _NEG_INF)
    weights = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


def _attn_kernel(q_ref, k_ref, v_ref, valid_ref, o_ref):
    """One (batch*head) slice: fused softmax(QK^T + causal + padding) V.

    ``valid_ref`` is the full (B*H, S) mask in VMEM (unblocked — TPU block
    shapes need sublane-divisible leading dims); rows are selected by
    program id.
    """
    q = q_ref[0]  # (S, D)
    k = k_ref[0]
    v = v_ref[0]
    valid = valid_ref[pl.program_id(0)]  # (S,) float32, 1.0 = valid key

    s = q.shape[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )  # (S, S)

    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = (col <= row) & (valid[None, :] > 0)
    logits = jnp.where(mask, logits, _NEG_INF)

    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)
    o_ref[0] = jax.lax.dot_general(
        w.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _pallas_forward(q, k, v, key_valid, interpret):
    batch, seq, heads, dim = q.shape

    def flat(x):  # (B, S, H, D) -> (B*H, S, D)
        return x.transpose(0, 2, 1, 3).reshape(batch * heads, seq, dim)

    valid = jnp.repeat(key_valid.astype(jnp.float32), heads, axis=0)  # (B*H, S)

    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((batch * heads, seq, dim), q.dtype),
        grid=(batch * heads,),
        in_specs=[
            pl.BlockSpec((1, seq, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, seq, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full mask array
        ],
        out_specs=pl.BlockSpec((1, seq, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        interpret=interpret,
    )(flat(q), flat(k), flat(v), valid)
    return out.reshape(batch, heads, seq, dim).transpose(0, 2, 1, 3)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_causal_attention(q, k, v, key_valid, interpret=False):
    """Pallas-fused causal attention; differentiable (XLA backward)."""
    return _pallas_forward(q, k, v, key_valid, interpret)


def _fwd(q, k, v, key_valid, interpret):
    return _pallas_forward(q, k, v, key_valid, interpret), (q, k, v, key_valid)


def _bwd(interpret, residuals, g):
    q, k, v, key_valid = residuals
    _, vjp = jax.vjp(lambda q, k, v: xla_causal_attention(q, k, v, key_valid), q, k, v)
    dq, dk, dv = vjp(g)
    return dq, dk, dv, None


fused_causal_attention.defvjp(_fwd, _bwd)


def supports_pallas(seq: int, dim: int) -> bool:
    """Tiling/size constraints for the whole-sequence kernel."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # Min sublane tile is 8 (f32); keep the whole (S, S) logits in VMEM.
    return seq >= 8 and seq % 8 == 0 and seq <= 2048 and dim <= 256
