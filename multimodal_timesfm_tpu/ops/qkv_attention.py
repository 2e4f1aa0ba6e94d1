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
    ``(B, S, 3*H*D)`` — no host-side slicing, head reshaping, or
    transposing (the only host ops are row-major ``(B, S, C) -> (B*S, C)``
    collapses, which are free bitcasts),
  * each program processes a TILE of batch rows; attention runs per head
    over all tile rows at once as ONE block-diagonal masked matmul (the
    row tile is the "pack" — same masking math as
    ``ops.attention._masked_softmax`` with slice length S), so the per-head
    lane slices are bulk ``(BT*S, D)`` reads. A first revision packed
    heads-per-row instead: 48 tiny lane-relayout stores per ROW and one
    tiny program per row measured −2.2% end-to-end at c512 — the packing
    VPU work and grid-step overhead ate the entire win,
  * output is ``(B, S, H*D)`` — exactly what the out-projection GEMM wants,
  * the backward kernel RECOMPUTES the attention weights from the saved qkv
    (no probs residual at all) and emits ``dqkv`` in ``(B, S, 3*H*D)`` —
    exactly what the qkv dX GEMM wants, and the incoming ``g`` is consumed
    in the out-projection dX GEMM's natural ``(B, S, H*D)`` layout,
  * residuals: the qkv tensor itself (byte-identical to the q+k+v saves the
    XLA path stacks) plus the (B, S) mask — strictly FEWER bytes than the
    XLA path (which additionally stacks the low-precision probs).

Mosaic constraints found on v5e (all invisible to interpret mode, caught by
``bench.py --kernel-check``): in-kernel ``reshape`` of a multi-row block
(``(bt, seq, C) -> (bt*seq, C)``) materializes a ``tpu.concatenate`` over
lane-offset pieces, which Mosaic rejects ("result/input offset mismatch on
non-concat dimension") — so ALL rank changes happen on the host and every
ref is 2D (mask: the ``(G, 1, BT*S)`` block trick from ``ops.attention``);
``tpu.concatenate`` likewise rejects lane-offset head slices directly, so
head extraction goes through offset-0 VMEM scratch STORES (which do
relayout); and a scratch region reused across in-kernel loop iterations is
a scheduler hazard (wrong results at S=64), so every head gets its own
scratch slab.

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

# Packed-row cap: (BT*S)^2 fp32 logits stay ~0.26 MB and the row-tile blocks
# keep the backward's VMEM (qkv + g + dqkv + per-head slabs) well under the
# ~16 MB budget. 512 was A/B'd back-to-back on v5e and LOST on both regimes
# (c512 6,738 vs 7,099 series/s; c2048 1,871 vs 2,036) — the bigger
# block-diagonal matmuls don't pay for the 4x wasted cross-row MACs and the
# halved double-buffering overlap. Process-start-only knob (read once at
# import; compiled programs are not invalidated by flipping it later), kept
# for back-to-back tile A/Bs.
import os as _os

_MAX_TILE_ROWS = int(_os.environ.get("MTT_QKV_TILE_ROWS", "256"))

# Save the qkv residual as its 2D (B*S, 3HD) collapse instead of the 3D
# (B, S, 3HD) view. The r5 c512 trace shows the backward paying a 94 us
# {2,0,1}->{2,1,0} layout copy per layer-step (copy.160/162, ~3.8 ms/step)
# to feed the stacked residual into the backward custom call's {1,0} row
# layout; stacking the already-collapsed 2D value gives XLA's layout
# assignment a direct match. Measured back-to-back on v5e: c512 (S=16)
# 7,084 -> 7,248 series/s (+2.3%), c2048 (S=64) 2,030 -> 1,988 (-2.1%,
# noise-band negative) — so the default is seq-gated: 2D save at S <= 32,
# 3D above. MTT_QKV_SAVE2D=1/0 forces either way (process-start-only knob,
# same caveat as the tile cap). A direct-slice kernel variant (head slices
# fed straight from the block ref, no scratch slabs) was also A/B'd and
# LOST badly (c512 -8.3%; combined with save2d -5.9%) — Mosaic's
# per-operand relayouts are worse than the bulk slab stores — and was
# deleted; docs/PERF.md levers table keeps the record.
_SAVE2D_ENV = _os.environ.get("MTT_QKV_SAVE2D", "").strip().lower()
_SAVE2D: bool | None = (
    True if _SAVE2D_ENV in ("1", "true", "yes")
    else False if _SAVE2D_ENV in ("0", "false", "no")
    else None  # auto: seq-gated
)
_SAVE2D_MAX_SEQ = 32


def _row_tile(batch: int, seq: int) -> int:
    """Batch rows per program: largest divisor of ``batch`` with BT*S <= cap."""
    bt = 1
    for cand in range(1, batch + 1):
        if batch % cand == 0 and cand * seq <= _MAX_TILE_ROWS:
            bt = cand
    return bt


def _fwd_kernel(
    qkv_ref: Any, valid_ref: Any, o_ref: Any, qs: Any, ks: Any, vs: Any,
    *, seq: int, heads: int, dim: int, bt: int,
) -> None:
    hd = heads * dim
    rows_per = bt * seq
    qkv = qkv_ref[...]  # (BT*S, 3*H*D)
    valid = valid_ref[0, 0]  # (BT*S,)
    for h in range(heads):
        # Bulk per-head lane slices into offset-0 slabs (one store per head,
        # covering every row of the tile).
        rows = slice(h * rows_per, (h + 1) * rows_per)
        qs[rows, :] = qkv[:, h * dim : (h + 1) * dim].astype(qs.dtype)
        ks[rows, :] = qkv[:, hd + h * dim : hd + (h + 1) * dim].astype(ks.dtype)
        vs[rows, :] = qkv[:, 2 * hd + h * dim : 2 * hd + (h + 1) * dim].astype(
            vs.dtype
        )
    for h in range(heads):
        rows = slice(h * rows_per, (h + 1) * rows_per)
        q, k, v = qs[rows, :], ks[rows, :], vs[rows, :]
        # Block-diagonal over the bt packed rows (slice length = seq):
        # cross-row attention masked exactly like causal-future entries.
        w = _masked_softmax(q, k, valid, seq)
        o = jax.lax.dot_general(
            w.astype(v.dtype), v, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, h * dim : (h + 1) * dim] = o.astype(o_ref.dtype)


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
    bt: int,
) -> None:
    hd = heads * dim
    rows_per = bt * seq
    qkv = qkv_ref[...]  # (BT*S, 3*H*D)
    g_all = g_ref[...]  # (BT*S, H*D)
    valid = valid_ref[0, 0]
    for h in range(heads):
        rows = slice(h * rows_per, (h + 1) * rows_per)
        qs[rows, :] = qkv[:, h * dim : (h + 1) * dim].astype(qs.dtype)
        ks[rows, :] = qkv[:, hd + h * dim : hd + (h + 1) * dim].astype(ks.dtype)
        vs[rows, :] = qkv[:, 2 * hd + h * dim : 2 * hd + (h + 1) * dim].astype(
            vs.dtype
        )
        gs[rows, :] = g_all[:, h * dim : (h + 1) * dim].astype(gs.dtype)
    for h in range(heads):
        rows = slice(h * rows_per, (h + 1) * rows_per)
        q, k, v, g = qs[rows, :], ks[rows, :], vs[rows, :], gs[rows, :]
        w = _masked_softmax(q, k, valid, seq)
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
            dl, k.astype(jnp.float32), (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dk = jax.lax.dot_general(
            dl, q.astype(jnp.float32), (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        dqkv_ref[:, h * dim : (h + 1) * dim] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, hd + h * dim : hd + (h + 1) * dim] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, 2 * hd + h * dim : 2 * hd + (h + 1) * dim] = dv.astype(
            dqkv_ref.dtype
        )


def _launch(
    kernel: Any,
    qkv: jax.Array,
    key_valid: jax.Array,
    extra: tuple,
    out_cols: int,
    seq: int,
    heads: int,
    dim: int,
    interpret: bool,
    scratch_dtype: Any,
    n_scratch: int,
) -> jax.Array:
    """All rank changes live HERE (free row-major collapses); the kernel refs
    are strictly 2D plus the (G, 1, BT*S) mask block (module docstring)."""
    batch = qkv.shape[0]
    bt = _row_tile(batch, seq)
    grid = batch // bt
    rows_per = bt * seq
    qkv2 = qkv.reshape(batch * seq, 3 * heads * dim)
    valid3 = key_valid.astype(jnp.float32).reshape(grid, 1, rows_per)
    extra2 = tuple(e.reshape(batch * seq, heads * dim) for e in extra)
    qkv_spec = pl.BlockSpec(
        (rows_per, 3 * heads * dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # (G, 1, BT*S) mask, (1, 1, BT*S) blocks — the leading singleton indexing
    # satisfies the Mosaic trailing-dims rule (see ops.attention._launch).
    mask_spec = pl.BlockSpec(
        (1, 1, rows_per), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec(
        (rows_per, heads * dim), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (rows_per, out_cols), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    out = pl.pallas_call(
        functools.partial(kernel, seq=seq, heads=heads, dim=dim, bt=bt),
        out_shape=jax.ShapeDtypeStruct((batch * seq, out_cols), qkv.dtype),
        grid=(grid,),
        in_specs=[qkv_spec, mask_spec] + [g_spec] * len(extra),
        out_specs=out_spec,
        # One disjoint slab per head (hazard note in the module docstring).
        scratch_shapes=[pltpu.VMEM((heads * rows_per, dim), scratch_dtype)]
        * n_scratch,
        # The backward at grid > 1 (input/output double-buffering active)
        # sits just past Mosaic's conservative 16 MB scoped-VMEM default
        # (measured 16.22 MB at B*S=512, seq=64); v5e has 128 MB physical
        # VMEM per core, so raise the scoped limit rather than shrinking
        # the row tile (smaller tiles were the v1 kernel's downfall).
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(qkv2, valid3, *extra2)
    return out.reshape(batch, seq, out_cols)


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
    # Forward packs in the compute dtype (matches _attn_fwd_kernel numerics).
    return _launch(
        _fwd_kernel, qkv, key_valid, (), num_heads * head_dim,
        qkv.shape[1], num_heads, head_dim, interpret, qkv.dtype, 3,
    )


def _fwd(
    qkv: jax.Array,
    key_valid: jax.Array,
    num_heads: int,
    head_dim: int,
    interpret: bool,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array]]:
    out = fused_qkv_causal_attention(qkv, key_valid, num_heads, head_dim, interpret)
    b, s, c = qkv.shape
    save2d = _SAVE2D if _SAVE2D is not None else s <= _SAVE2D_MAX_SEQ
    return out, (qkv.reshape(b * s, c) if save2d else qkv, key_valid)


def _bwd(
    num_heads: int,
    head_dim: int,
    interpret: bool,
    residuals: tuple[jax.Array, jax.Array],
    g: jax.Array,
) -> tuple[jax.Array, None]:
    qkv, key_valid = residuals
    if qkv.ndim == 2:  # 2D residual save (see _SAVE2D): restore the 3D view
        b, s = key_valid.shape
        qkv = qkv.reshape(b, s, qkv.shape[-1])
    # Backward packs q/k/v in the compute dtype (the saved values ARE bf16,
    # so the fp32 upcast happens at the dots — same accumulation as the XLA
    # oracle's backward) and keeps the softmax/VJP chain in fp32.
    dqkv = _launch(
        _bwd_kernel, qkv, key_valid, (g,), 3 * num_heads * head_dim,
        qkv.shape[1], num_heads, head_dim, interpret, qkv.dtype, 4,
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
