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
  * backward pass: a second whole-sequence Pallas kernel that recomputes the
    attention weights from the saved (q, k, v) residuals and produces
    (dq, dk, dv) in one fused pass (softmax VJP in-kernel) — no (S, S)
    tensors ever round-trip HBM in either direction,
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


def _attn_bwd_kernel(q_ref, k_ref, v_ref, valid_ref, g_ref, dq_ref, dk_ref, dv_ref):
    """Fused backward for one (batch*head) slice.

    Recomputes W = softmax(masked QK^T), then
        dV = W^T g,   dW = g V^T,
        dL = W * (dW - rowsum(dW * W))   (softmax VJP),
        dQ = dL K,    dK = dL^T Q.
    Masked entries have W = 0, so dL vanishes there automatically.
    """
    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    g = g_ref[0]
    valid = valid_ref[pl.program_id(0)]

    s = q.shape[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = (col <= row) & (valid[None, :] > 0)
    logits = jnp.where(mask, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    w = e / jnp.sum(e, axis=-1, keepdims=True)  # (S, S) fp32

    g32 = g.astype(jnp.float32)
    v32 = v.astype(jnp.float32)
    dv = jax.lax.dot_general(w, g32, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32)
    dw = jax.lax.dot_general(g32, v32, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
    dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
    dq = jax.lax.dot_general(
        dl, k.astype(jnp.float32), (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dk = jax.lax.dot_general(
        dl, q.astype(jnp.float32), (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    dq_ref[0] = dq.astype(dq_ref.dtype)
    dk_ref[0] = dk.astype(dk_ref.dtype)
    dv_ref[0] = dv.astype(dv_ref.dtype)


def _pallas_backward(q, k, v, key_valid, g, interpret):
    batch, seq, heads, dim = q.shape

    def flat(x):
        return x.transpose(0, 2, 1, 3).reshape(batch * heads, seq, dim)

    valid = jnp.repeat(key_valid.astype(jnp.float32), heads, axis=0)
    spec = pl.BlockSpec((1, seq, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)

    dq, dk, dv = pl.pallas_call(
        _attn_bwd_kernel,
        out_shape=[jax.ShapeDtypeStruct((batch * heads, seq, dim), q.dtype)] * 3,
        grid=(batch * heads,),
        in_specs=[
            spec,
            spec,
            spec,
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full mask array
            spec,
        ],
        out_specs=[spec, spec, spec],
        interpret=interpret,
    )(flat(q), flat(k), flat(v), valid, flat(g))

    def unflat(x):
        return x.reshape(batch, heads, seq, dim).transpose(0, 2, 1, 3)

    return unflat(dq), unflat(dk), unflat(dv)


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
    dq, dk, dv = _pallas_backward(q, k, v, key_valid, g, interpret)
    return dq, dk, dv, None


fused_causal_attention.defvjp(_fwd, _bwd)


def supports_pallas(seq: int, dim: int) -> bool:
    """Tiling/size constraints for the whole-sequence kernel."""
    if jax.default_backend() not in ("tpu", "axon"):
        return False
    # Min sublane tile is 8 (f32); keep the whole (S, S) logits in VMEM.
    return seq >= 8 and seq % 8 == 0 and seq <= 2048 and dim <= 256
