"""Fused small-S causal attention over the RAW fused-qkv GEMM output.

Round-4's packed attention kernel won its isolated micro-bench but LOST
end-to-end (docs/PERF.md levers table). The r5 traces show why, precisely:
at the 16/64-token TimesFM regimes ~25-30% of device time is the *attention
middle* — the qkv slice/reshape copies (``layers.py:280-298``), the
``bhqk`` layout transposes around the attention einsums
(``attention.py:125/132``), the softmax output fusion running at ~90 GB/s,
and the fp32/bf16 probs residual stacks — while the GEMMs themselves already
run at 0.92 of peak. The r4 kernel eliminated none of those: its host-side
``_flatten_heads``/``pack_rows`` plumbing ADDED transposes, and its custom
VJP re-saved q/k/v/g as new per-layer residual streams.

This kernel takes the attention middle end to end instead:

  * input is the fused qkv projection output in its NATURAL layout
    ``(B, S, 3*H*D)`` — no host-side slicing, reshaping, or transposing;
    heads are sliced on the lane dimension *inside* the kernel (VMEM ops),
  * per program (one batch row) consecutive heads are packed on the row
    axis into MXU-sized block-diagonal matmuls (same exact masking math as
    ``ops.attention._masked_softmax``),
  * output is ``(B, S, H*D)`` — exactly what the out-projection GEMM wants,
  * the backward kernel RECOMPUTES the attention weights from the saved qkv
    (no probs residual at all) and emits ``dqkv`` in ``(B, S, 3*H*D)`` —
    exactly what the qkv dX GEMM wants, and the incoming ``g`` is consumed
    in the out-projection dX GEMM's natural ``(B, S, H*D)`` layout,
  * residuals: the qkv tensor itself (byte-identical to the q+k+v saves the
    XLA path stacks) plus the (B, S) mask — strictly FEWER bytes than the
    XLA path (which additionally stacks the low-precision probs).

Numerics match the XLA path's contract: fp32 logits/softmax, weights cast
to the compute dtype for the PV matmul, fp32 recompute in backward.
Reference semantics: upstream TimesFM attention
(``/root/reference/src/tsfmx/tsfm/timesfm.py:95-98`` wiring).
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_timesfm_tpu.ops.attention import _masked_softmax, is_tpu_backend


def _head_pack(seq: int, heads: int) -> int:
    """Heads packed per block-diagonal matmul: the largest divisor of
    ``heads`` keeping the packed row count <= 512 (VMEM (pS, pS) fp32 caps
    and the measured MXU sweet spot from the r4 pack experiments)."""
    pack = 1
    for cand in range(1, heads + 1):
        if heads % cand == 0 and cand * seq <= 512:
            pack = cand
    return pack


def _pack_heads(qkv: jax.Array, scratch: Any, slab: int, base: int, group: Any, seq: int, dim: int) -> jax.Array:
    """Assemble head slices ``qkv[:, base + h*dim : ...]`` row-wise into the
    offset-0 VMEM ``scratch`` slab and read the packed (pack*S, D) block back.

    Mosaic's ``tpu.concatenate`` rejects lane-offset inputs ("result/input
    offset mismatch on non-concat dimension" — head boundaries at D=80 are
    not 128-lane aligned), but offset STORES relayout fine, so the packing
    goes through a scratch buffer instead of a concat (probed on v5e).
    ``slab`` indexes the head group's own region of the scratch: REUSING one
    region across in-kernel group iterations produced wrong results on the
    real TPU at multi-group geometries (S=64/pack=8 — a write-after-read
    hazard the Mosaic scheduler does not order; caught by --kernel-check,
    invisible to interpret mode), so every group packs into disjoint rows.
    """
    pack = len(group)
    row0 = slab * pack * seq
    for i, h in enumerate(group):
        scratch[row0 + i * seq : row0 + (i + 1) * seq, :] = qkv[
            :, base + h * dim : base + (h + 1) * dim
        ].astype(scratch.dtype)
    return scratch[row0 : row0 + pack * seq, :]


def _fwd_kernel(
    qkv_ref: Any, valid_ref: Any, o_ref: Any, qs: Any, ks: Any, vs: Any,
    *, seq: int, heads: int, dim: int,
) -> None:
    hd = heads * dim
    pack = _head_pack(seq, heads)
    qkv = qkv_ref[0]  # (S, 3*H*D)
    for slab, g0 in enumerate(range(0, heads, pack)):
        group = range(g0, g0 + pack)
        q = _pack_heads(qkv, qs, slab, 0, group, seq, dim)
        k = _pack_heads(qkv, ks, slab, hd, group, seq, dim)
        v = _pack_heads(qkv, vs, slab, 2 * hd, group, seq, dim)
        w = _masked_softmax(q, k, valid_ref[0, 0], seq)
        o = jax.lax.dot_general(
            w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)
        for i, h in enumerate(group):
            o_ref[0, :, h * dim : (h + 1) * dim] = o[i * seq : (i + 1) * seq]


def _bwd_kernel(
    qkv_ref: Any,
    valid_ref: Any,
    g_ref: Any,
    dqkv_ref: Any,
    qs: Any,
    ks: Any,
    vs: Any,
    gs: Any,
    *,
    seq: int,
    heads: int,
    dim: int,
) -> None:
    hd = heads * dim
    pack = _head_pack(seq, heads)
    qkv = qkv_ref[0]
    for slab, g0 in enumerate(range(0, heads, pack)):
        group = range(g0, g0 + pack)
        q = _pack_heads(qkv, qs, slab, 0, group, seq, dim)
        k = _pack_heads(qkv, ks, slab, hd, group, seq, dim)
        v = _pack_heads(qkv, vs, slab, 2 * hd, group, seq, dim)
        g = _pack_heads(g_ref[0], gs, slab, 0, group, seq, dim)
        w = _masked_softmax(q, k, valid_ref[0, 0], seq)
        g32 = g.astype(jnp.float32)
        v32 = v.astype(jnp.float32)
        dv = jax.lax.dot_general(
            w, g32, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dw = jax.lax.dot_general(
            g32, v32, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
        )
        dl = w * (dw - jnp.sum(dw * w, axis=-1, keepdims=True))
        dq = jax.lax.dot_general(
            dl, k, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        dk = jax.lax.dot_general(
            dl, q, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        for i, h in enumerate(group):
            rows = slice(i * seq, (i + 1) * seq)
            dqkv_ref[0, :, h * dim : (h + 1) * dim] = dq[rows].astype(dqkv_ref.dtype)
            dqkv_ref[0, :, hd + h * dim : hd + (h + 1) * dim] = dk[rows].astype(
                dqkv_ref.dtype
            )
            dqkv_ref[0, :, 2 * hd + h * dim : 2 * hd + (h + 1) * dim] = dv[
                rows
            ].astype(dqkv_ref.dtype)


def _launch(kernel: Any, qkv, valid3, extra, out_cols: int, seq: int, heads: int, dim: int, interpret: bool, scratch_dtype: Any, n_scratch: int):
    batch = qkv.shape[0]
    pack = _head_pack(seq, heads)
    qkv_spec = pl.BlockSpec(
        (1, seq, 3 * heads * dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    # (B, 1, pack*S) mask, (1, 1, pack*S) blocks — the singleton middle axis
    # satisfies the Mosaic trailing-dims rule (see ops.attention._launch).
    mask_spec = pl.BlockSpec(
        (1, 1, pack * seq), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (1, seq, heads * dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, seq, out_cols), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(kernel, seq=seq, heads=heads, dim=dim),
        out_shape=jax.ShapeDtypeStruct((batch, seq, out_cols), qkv.dtype),
        grid=(batch,),
        in_specs=[qkv_spec, mask_spec] + [g_spec] * len(extra),
        out_specs=out_spec,
        # One disjoint slab per head group (H*S rows total) — see _pack_heads.
        scratch_shapes=[pltpu.VMEM((heads * seq, dim), scratch_dtype)] * n_scratch,
        interpret=interpret,
    )(qkv, valid3, *extra)


def _tiled_valid(key_valid: jax.Array, seq: int, heads: int) -> jax.Array:
    pack = _head_pack(seq, heads)
    valid = key_valid.astype(jnp.float32)
    if pack > 1:
        valid = jnp.tile(valid, (1, pack))
    return valid[:, None, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def fused_qkv_causal_attention(
    qkv: jax.Array,
    key_valid: jax.Array,
    num_heads: int,
    head_dim: int,
    interpret: bool = False,
) -> jax.Array:
    """softmax(QK^T + causal + padding) V over the raw (B, S, 3*H*D) qkv.

    Args:
        qkv: (B, S, 3*H*D) fused projection output, q pre-scaled (the
            per-dim query scale is applied by the caller or folded into the
            weights — ``fold_frozen_affines``).
        key_valid: (B, S) bool, True = valid key.

    Returns:
        (B, S, H*D), ready for the out-projection GEMM.
    """
    valid3 = _tiled_valid(key_valid, qkv.shape[1], num_heads)
    # Forward packs in the compute dtype (matches _attn_fwd_kernel numerics).
    return _launch(
        _fwd_kernel, qkv, valid3, (), num_heads * head_dim,
        qkv.shape[1], num_heads, head_dim, interpret, qkv.dtype, 3,
    )


def _fwd(qkv, key_valid, num_heads, head_dim, interpret):
    out = fused_qkv_causal_attention(qkv, key_valid, num_heads, head_dim, interpret)
    return out, (qkv, key_valid)


def _bwd(num_heads, head_dim, interpret, residuals, g):
    qkv, key_valid = residuals
    valid3 = _tiled_valid(key_valid, qkv.shape[1], num_heads)
    # Backward packs in fp32 (matches _attn_bwd_kernel's fp32 recompute).
    dqkv = _launch(
        _bwd_kernel, qkv, valid3, (g,), 3 * num_heads * head_dim,
        qkv.shape[1], num_heads, head_dim, interpret, jnp.float32, 4,
    )
    return dqkv, None


fused_qkv_causal_attention.defvjp(_fwd, _bwd)


def supports_qkv_fused(seq: int, heads: int, dim: int) -> bool:
    """Gate for the fused-qkv kernel: the small-S whole-sequence regimes
    (16-192 tokens) where the XLA attention middle dominates. At S >= 256
    one head slice per program already feeds the MXU and the classic
    whole-sequence kernel path wins (``ops.attention.supports_pallas``);
    below 256 this kernel replaces the XLA fallback. Off-TPU: False (the
    interpret path is for tests only).
    """
    from multimodal_timesfm_tpu.ops import attention as _attn

    if _attn._FORCE_XLA or not is_tpu_backend():
        return False
    import os

    if os.environ.get("MTT_ATTN_QKV_FUSED", "1").strip().lower() in ("0", "false", "no"):
        return False
    return 8 <= seq < 256 and seq % 8 == 0 and dim <= 256 and dim % 8 == 0
