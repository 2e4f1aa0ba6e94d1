"""Fused bidirectional (T5-style) attention over the raw fused-qkv GEMM output.

The Chronos-2 encoder's attention middle on the bench geometries (67-80
tokens/row, 12 heads) is the same XLA churn the TimesFM fused-qkv kernel
removed (``ops/qkv_attention.py``): q/k/v slice+reshape copies, ``bhqk``
layout transposes, fp32 logits + probs residual streams stacked per layer
through the scan. Round-4's opt-in whole-sequence bidir kernel lost
end-to-end for exactly the custom-VJP-residual reason (docs/PERF.md): it
saved q/k/v/g per layer and severed XLA's attention<->projection fusions
(superseded by this kernel and removed in r5). This kernel applies the
row-tile design that fixed that for TimesFM, plus the two T5 extras.

OUTCOME (r5, docs/PERF.md levers): despite exact ``--kernel-check`` parity
it measured an end-to-end LOSER on both Chronos workloads (−11.5%
multimodal, −5.7% baseline) — the bidirectional regime's block-diagonal
fp32 bias stream per layer outweighs the removed churn — so it ships
OPT-IN (``MTT_CHRONOS_ROWTILE=1``) as this family's documented
negative-result kernel. Design details:

  * input is the fused qkv projection output in its NATURAL ``(B, S, 3*H*D)``
    layout (the encoder concatenates the three projection kernels into one
    GEMM), output is ``(B, S, H*D)`` — no host-side head reshapes/transposes,
  * each program processes a TILE of batch rows; attention per head is ONE
    block-diagonal masked matmul over all tile rows. Masking is driven by a
    SEGMENT-ID vector rather than slice arithmetic: query i attends key j
    iff ``seg[i] == seg[j]``. The host assigns ids unique per (row, segment)
    for valid tokens and a unique negative id per padded token (so padded
    queries attend only themselves — no NaN rows), which makes one mask
    mechanism cover per-row bidirectional attention, cross-row tile packing,
    AND Chronos-2's ``group_ids`` segment packing (reference semantics:
    ``/root/reference/src/tsfmx/tsfm/chronos.py:62-126``),
  * the T5 relative-position bias enters as a host-pretiled block-diagonal
    ``(H*BT*S, BT*S)`` fp32 input (``make_rowtile_bias``; off-diagonal tiles
    are masked so the tiling is exact). The backward ACCUMULATES ``dbias``
    across grid steps into a second kernel output with a constant index map
    (TPU grids run sequentially, so read-modify-write accumulation into a
    revisited output block is the canonical reduction pattern) — the bias is
    trainable in baseline mode, so the kernel must produce its cotangent;
    the host-side ``jnp.tile`` VJP then reduces the block-diagonal cotangent
    back to ``(H, S, S)`` and the bucket-gather VJP scatters into the
    ``(buckets, H)`` table,
  * the backward RECOMPUTES the attention weights from the saved qkv (no
    probs or logits residual; the only saved streams are the qkv tensor, the
    segment vector, and the layer-invariant bias, which JAX hoists out of
    the scan's stacked residuals).

Mosaic constraints inherited from ``ops/qkv_attention.py`` (module
docstring there): all rank changes happen on the host and every ref is 2D
(segment vector: the ``(G, 1, BT*S)`` block trick); per-head lane slices go
through offset-0 VMEM scratch stores; one disjoint scratch slab per head.

Numerics match the XLA encoder path: fp32 logits/bias/softmax, weights cast
to the compute dtype for the PV matmul, fp32 recompute in backward, and NO
query scaling (T5 convention — folded into the weights, see
``models/chronos.py``).
"""

from __future__ import annotations

import functools
import os
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from multimodal_timesfm_tpu.ops.attention import _NEG_INF, is_tpu_backend

# Packed-row cap, sized for the bench geometry (S=72 padded, 12 heads,
# head_dim 64): bt=4 rows/program -> (288)^2 fp32 logits ~0.33 MB and the
# backward's VMEM (double-buffered qkv/g/dqkv blocks, per-head slabs, the
# resident bias + dbias accumulator) ~17 MB, inside the raised scoped limit
# below. Process-start-only knob (read once at import), kept for tile A/Bs.
_TILE_CAP = int(os.environ.get("MTT_CHRONOS_TILE_ROWS", "288"))


def _row_tile(batch: int, seq: int) -> int:
    """Batch rows per program: largest divisor of ``batch`` with BT*S <= cap."""
    bt = 1
    for cand in range(1, batch + 1):
        if batch % cand == 0 and cand * seq <= _TILE_CAP:
            bt = cand
    return bt


def make_rowtile_bias(bias_hss: jax.Array, batch: int, seq: int) -> jax.Array:
    """Pretile the (H, S, S) rel-pos bias to the kernel's block-diagonal form.

    Returns ``(H*BT*S, BT*S)`` fp32 where each head's block is the (S, S)
    bias tiled BTxBT times — off-diagonal tiles land on segment-masked
    logits, so the tiling is exact. Built ONCE outside the layer scan (the
    bias table is shared across layers); its ``jnp.tile`` VJP reduces the
    kernel's block-diagonal cotangent back to (H, S, S).
    """
    bt = _row_tile(batch, seq)
    h = bias_hss.shape[0]
    return jnp.tile(bias_hss, (1, bt, bt)).reshape(h * bt * seq, bt * seq)


def _seg_softmax(q: Any, k: Any, seg: Any, bias: Any) -> Any:
    """In-kernel fp32 softmax(QK^T + bias) with segment-equality masking.

    q, k: (R, D); seg: (R,) fp32 ids (unique per attention group, every
    padded token its own group — so every row keeps at least its diagonal
    and no row is fully masked); bias: (R, R) fp32. Returns (R, R) fp32.
    """
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits + bias
    mask = seg[:, None] == seg[None, :]
    logits = jnp.where(mask, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _fwd_kernel(
    qkv_ref: Any, seg_ref: Any, bias_ref: Any, o_ref: Any, qs: Any, ks: Any,
    vs: Any, *, heads: int, dim: int, rows: int,
) -> None:
    hd = heads * dim
    qkv = qkv_ref[...]  # (R, 3*H*D)
    seg = seg_ref[0, 0]  # (R,)
    for h in range(heads):
        r = slice(h * rows, (h + 1) * rows)
        qs[r, :] = qkv[:, h * dim : (h + 1) * dim].astype(qs.dtype)
        ks[r, :] = qkv[:, hd + h * dim : hd + (h + 1) * dim].astype(ks.dtype)
        vs[r, :] = qkv[:, 2 * hd + h * dim : 2 * hd + (h + 1) * dim].astype(
            vs.dtype
        )
    for h in range(heads):
        r = slice(h * rows, (h + 1) * rows)
        w = _seg_softmax(qs[r, :], ks[r, :], seg, bias_ref[r, :])
        o = jax.lax.dot_general(
            w.astype(vs.dtype), vs[r, :], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        o_ref[:, h * dim : (h + 1) * dim] = o.astype(o_ref.dtype)


def _bwd_kernel(
    qkv_ref: Any,
    seg_ref: Any,
    bias_ref: Any,
    g_ref: Any,
    dqkv_ref: Any,
    dbias_ref: Any,
    qs: Any,
    ks: Any,
    vs: Any,
    gs: Any,
    *,
    heads: int,
    dim: int,
    rows: int,
) -> None:
    hd = heads * dim
    i = pl.program_id(0)
    qkv = qkv_ref[...]
    g_all = g_ref[...]
    seg = seg_ref[0, 0]
    for h in range(heads):
        r = slice(h * rows, (h + 1) * rows)
        qs[r, :] = qkv[:, h * dim : (h + 1) * dim].astype(qs.dtype)
        ks[r, :] = qkv[:, hd + h * dim : hd + (h + 1) * dim].astype(ks.dtype)
        vs[r, :] = qkv[:, 2 * hd + h * dim : 2 * hd + (h + 1) * dim].astype(
            vs.dtype
        )
        gs[r, :] = g_all[:, h * dim : (h + 1) * dim].astype(gs.dtype)
    for h in range(heads):
        r = slice(h * rows, (h + 1) * rows)
        q, k, v, g = qs[r, :], ks[r, :], vs[r, :], gs[r, :]
        w = _seg_softmax(q, k, seg, bias_ref[r, :])
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
        # dbias = dl summed over grid steps: masked entries have w = 0 hence
        # dl = 0, so off-diagonal tiles contribute exact zeros. Sequential
        # TPU grid + constant index map -> the accumulator block stays
        # resident in VMEM across steps and is flushed once at the end.

        @pl.when(i == 0)
        def _init() -> None:
            dbias_ref[r, :] = dl

        @pl.when(i != 0)
        def _accumulate() -> None:
            dbias_ref[r, :] = dbias_ref[r, :] + dl


def _specs(rows: int, cols_qkv: int, cols_o: int, heads: int) -> tuple:
    qkv_spec = pl.BlockSpec(
        (rows, cols_qkv), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    # (G, 1, BT*S) segment ids, (1, 1, BT*S) blocks — the leading singleton
    # indexing satisfies the Mosaic trailing-dims rule (ops.attention._launch).
    seg_spec = pl.BlockSpec(
        (1, 1, rows), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    bias_spec = pl.BlockSpec(
        (heads * rows, rows), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    o_spec = pl.BlockSpec((rows, cols_o), lambda i: (i, 0), memory_space=pltpu.VMEM)
    return qkv_spec, seg_spec, bias_spec, o_spec


# The backward at grid > 1 (double-buffered qkv/g/dqkv blocks + the resident
# bias and dbias accumulator) exceeds Mosaic's conservative 16 MB scoped
# default; v5e has 128 MB physical VMEM per core.
_COMPILER_PARAMS = pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_chronos_attention(
    qkv: jax.Array,
    seg: jax.Array,
    bias_bd: jax.Array,
    num_heads: int,
    head_dim: int,
    interpret: bool = False,
) -> jax.Array:
    """softmax(QK^T + rel-pos bias + segment mask) V over raw (B, S, 3*H*D) qkv.

    Args:
        qkv: (B, S, 3*H*D) fused projection output (T5: queries UNscaled).
        seg: (B, S) int32 attention-group ids — unique per (row, segment),
            every padded token its own unique id (see module docstring).
        bias_bd: (H*BT*S, BT*S) fp32 from ``make_rowtile_bias`` (the SAME
            batch/seq so the tile factor matches).

    Returns:
        (B, S, H*D), ready for the out-projection GEMM.
    """
    batch, sp, _ = qkv.shape
    bt = _row_tile(batch, sp)
    rows = bt * sp
    hd = num_heads * head_dim
    qkv_spec, seg_spec, bias_spec, o_spec = _specs(rows, 3 * hd, hd, num_heads)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, heads=num_heads, dim=head_dim, rows=rows),
        out_shape=jax.ShapeDtypeStruct((batch * sp, hd), qkv.dtype),
        grid=(batch // bt,),
        in_specs=[qkv_spec, seg_spec, bias_spec],
        out_specs=o_spec,
        scratch_shapes=[pltpu.VMEM((num_heads * rows, head_dim), qkv.dtype)] * 3,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        qkv.reshape(batch * sp, 3 * hd),
        seg.astype(jnp.float32).reshape(batch // bt, 1, rows),
        bias_bd,
    )
    return out.reshape(batch, sp, hd)


def _fwd(
    qkv: jax.Array,
    seg: jax.Array,
    bias_bd: jax.Array,
    num_heads: int,
    head_dim: int,
    interpret: bool,
) -> tuple[jax.Array, tuple[jax.Array, jax.Array, jax.Array]]:
    out = fused_chronos_attention(qkv, seg, bias_bd, num_heads, head_dim, interpret)
    return out, (qkv, seg, bias_bd)


def _bwd(
    num_heads: int,
    head_dim: int,
    interpret: bool,
    residuals: tuple[jax.Array, jax.Array, jax.Array],
    g: jax.Array,
) -> tuple[jax.Array, None, jax.Array]:
    qkv, seg, bias_bd = residuals
    batch, sp, _ = qkv.shape
    bt = _row_tile(batch, sp)
    rows = bt * sp
    hd = num_heads * head_dim
    qkv_spec, seg_spec, bias_spec, _ = _specs(rows, 3 * hd, hd, num_heads)
    dqkv_spec = pl.BlockSpec(
        (rows, 3 * hd), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    g_spec = pl.BlockSpec((rows, hd), lambda i: (i, 0), memory_space=pltpu.VMEM)
    dqkv, dbias = pl.pallas_call(
        functools.partial(_bwd_kernel, heads=num_heads, dim=head_dim, rows=rows),
        out_shape=(
            jax.ShapeDtypeStruct((batch * sp, 3 * hd), qkv.dtype),
            jax.ShapeDtypeStruct((num_heads * rows, rows), jnp.float32),
        ),
        grid=(batch // bt,),
        in_specs=[qkv_spec, seg_spec, bias_spec, g_spec],
        out_specs=(dqkv_spec, bias_spec),
        scratch_shapes=[pltpu.VMEM((num_heads * rows, head_dim), qkv.dtype)] * 4,
        compiler_params=_COMPILER_PARAMS,
        interpret=interpret,
    )(
        qkv.reshape(batch * sp, 3 * hd),
        seg.astype(jnp.float32).reshape(batch // bt, 1, rows),
        bias_bd,
        g.reshape(batch * sp, hd),
    )
    return dqkv.reshape(batch, sp, 3 * hd), None, dbias


fused_chronos_attention.defvjp(_fwd, _bwd)


def supports_chronos_rowtile(seq: int, heads: int, dim: int) -> bool:
    """Gate for the fused row-tile encoder path. OFF by default: the
    back-to-back TPU A/B measured it as an end-to-end LOSER on both Chronos
    bench workloads (chronos_mm_h32 2,969 -> 2,627 series/s, MFU 0.475 ->
    0.420; chronos_baseline_h32 1,909 -> 1,800, MFU 0.458 -> 0.432) despite
    exact ``--kernel-check`` parity — unlike TimesFM's causal decoder, the
    T5 encoder's block-diagonal bias tiling adds an (H*BT*S, BT*S) fp32
    stream per layer that outweighs the removed layout churn (docs/PERF.md
    levers table, r5). ``MTT_CHRONOS_ROWTILE=1`` opts in (process-start
    only: the flag is read at trace time, so flipping it mid-process does
    not invalidate compiled programs). Off-TPU: False (interpret mode is
    for tests only).
    """
    from multimodal_timesfm_tpu.ops import attention as _attn

    if _attn._FORCE_XLA or not is_tpu_backend():
        return False
    if os.environ.get("MTT_CHRONOS_ROWTILE", "0").strip().lower() not in (
        "1",
        "true",
        "yes",
    ):
        return False
    return seq % 8 == 0 and 8 <= seq <= _TILE_CAP and dim <= 256 and dim % 8 == 0
