"""Fused bidirectional attention with additive bias: Pallas TPU kernels.

The Chronos-2 encoder's attention (``models/chronos.py``; reference
``/root/reference/src/tsfmx/tsfm/chronos.py:117-123``) is bidirectional with a
T5 relative-position bias shared across layers and a key-padding mask. The
unfused XLA path materializes (B, H, S, S) logits/weights per layer and the
backward stacks an fp32 probs residual through the layer scan; these kernels
compute ``softmax(QK^T + bias + mask) V`` whole-sequence in VMEM with a
recompute backward, like ``ops/attention.py``'s causal kernels.

Same packing trick as the causal kernels: Chronos runs 12 heads at ~67
tokens, an MXU-starved per-(batch*head) geometry, so ``pack`` consecutive
head slices execute per program as one block-diagonal (pack*S, pack*S)
masked softmax — numerically identical to separate programs.

The bias enters PRE-EXPANDED: callers build a block-diagonal
``(H/pack, pack*S, pack*S)`` tensor once (``make_packed_bias``; the T5 bias
is layer-independent, so one expansion serves the whole scanned stack) and
the backward ACCUMULATES ``d_bias`` across the batch grid dimension inside
the kernel (output block constant in the innermost grid dim — the Mosaic
revisit-accumulation pattern), so the kernel is exact for bias-training
(baseline mode) too; the expansion's own VJP is ordinary jnp autodiff.

Per-slice key-padding only — callers with packed multi-segment ROWS
(``Chronos2Adapter.forward(pack=k)``'s ``group_ids`` mechanism) use the XLA
path; this module's ``pack`` packs whole (batch, head) slices, not segments.
"""

from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)


def make_packed_bias(bias: jax.Array, pack: int, pad_to: int) -> jax.Array:
    """(H, S, S) additive bias -> block-diagonal (H/pack, pack*S', pack*S').

    ``pad_to`` (S') pads each slice's rows/cols with zeros (padded keys are
    killed by the kernel's validity mask, so the pad value is irrelevant).
    Plain differentiable jnp — its VJP routes the kernel's accumulated
    ``d_expanded`` back onto the (H, S, S) bias (and through it the T5
    bucket table) automatically.
    """
    heads, seq, _ = bias.shape
    if heads % pack:
        raise ValueError(f"pack ({pack}) must divide heads ({heads})")
    pad = pad_to - seq
    if pad < 0:
        raise ValueError(f"pad_to ({pad_to}) < seq ({seq})")
    if pad:
        bias = jnp.pad(bias, ((0, 0), (0, pad), (0, pad)))
    groups = bias.reshape(heads // pack, pack, pad_to, pad_to)
    # Block-diagonal placement: out[g, p*S'+i, p*S'+j] = groups[g, p, i, j].
    eye = jnp.eye(pack, dtype=bias.dtype)  # (p, q) selector
    return jnp.einsum("gpij,pq->gpiqj", groups, eye).reshape(
        heads // pack, pack * pad_to, pack * pad_to
    )


def _bidir_softmax(q: jax.Array, k: jax.Array, valid: jax.Array, bias: jax.Array, seq: int) -> jax.Array:
    """fp32 softmax(QK^T + bias) with key-padding + cross-slice masking.

    q, k: (P*S, D); valid: (P*S,) float 1.0 = valid key; bias: (P*S, P*S)
    fp32 block-diagonal. No causal mask (bidirectional); fully-masked query
    rows cannot occur for the callers (the [REG] + future tokens are always
    valid keys in every slice).
    """
    s = q.shape[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    logits = logits + bias
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = (row // seq == col // seq) & (valid[None, :] > 0)
    logits = jnp.where(mask, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _bidir_fwd_kernel(
    q_ref: Any, k_ref: Any, v_ref: Any, valid_ref: Any, bias_ref: Any, o_ref: Any, *, seq: int
) -> None:
    w = _bidir_softmax(q_ref[0], k_ref[0], valid_ref[0, 0], bias_ref[0], seq)
    o_ref[0] = jax.lax.dot_general(
        w.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _bidir_bwd_kernel(
    q_ref: Any, k_ref: Any, v_ref: Any, valid_ref: Any, bias_ref: Any, g_ref: Any,
    dq_ref: Any, dk_ref: Any, dv_ref: Any, dbias_ref: Any, *, seq: int
) -> None:
    """Recompute-backward; ``dbias`` accumulates across the batch grid dim.

    The dbias output block's index map is constant in the innermost grid
    dimension (batch), so Mosaic keeps it resident and this kernel implements
    the cross-batch reduction with the standard init-on-first-visit pattern.
    ``dL`` vanishes at masked entries (w = 0 there), so the accumulated
    ``d_expanded`` is exactly the bias cotangent, zero at cross-slice and
    invalid-key positions.
    """
    q = q_ref[0]
    k = k_ref[0]
    w = _bidir_softmax(q, k, valid_ref[0, 0], bias_ref[0], seq)

    g32 = g_ref[0].astype(jnp.float32)
    v32 = v_ref[0].astype(jnp.float32)
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

    @pl.when(pl.program_id(1) == 0)
    def _init() -> None:
        dbias_ref[0] = jnp.zeros_like(dbias_ref[0])

    dbias_ref[0] += dl


def _pack_slices(x: jax.Array, pack: int) -> jax.Array:
    """(B, S, H, D) -> (B*H/pack, pack*S, D); slice (b, h) at row b*H + h."""
    batch, seq, heads, dim = x.shape
    flat = x.transpose(0, 2, 1, 3).reshape(batch * heads, seq, dim)
    return flat.reshape(batch * heads // pack, pack * seq, dim)


def _unpack_slices(x: jax.Array, batch: int, heads: int) -> jax.Array:
    rows = x.shape[0] * x.shape[1] // (batch * heads)
    flat = x.reshape(batch, heads, rows, x.shape[-1])
    return flat.transpose(0, 2, 1, 3)


def _launch_bidir(
    kernel: Any,
    num_outputs: int,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: jax.Array,
    bias_exp: jax.Array,
    extra: tuple = (),
    interpret: bool = False,
    pack: int = 1,
) -> Any:
    batch, seq, heads, dim = q.shape
    if pack < 1 or heads % pack:
        raise ValueError(f"pack ({pack}) must divide num_heads ({heads})")
    groups = heads // pack
    ps = pack * seq
    if bias_exp.shape != (groups, ps, ps):
        raise ValueError(
            f"bias_exp shape {bias_exp.shape} != {(groups, ps, ps)} "
            "(build it with make_packed_bias at the padded sequence length)"
        )

    valid = key_valid.astype(jnp.float32)
    if pack > 1:
        valid = jnp.tile(valid, (1, pack))
    valid = valid[:, None, :]  # (B, 1, pack*S); trailing dims == block dims

    # Grid (head-group, batch): batch innermost so the backward's dbias block
    # (constant in batch) is revisited on consecutive iterations — the Mosaic
    # accumulation requirement.
    grid = (groups, batch)
    spec = pl.BlockSpec((1, ps, dim), lambda j, b: (b * grid[0] + j, 0, 0),
                        memory_space=pltpu.VMEM)
    mask_spec = pl.BlockSpec((1, 1, ps), lambda j, b: (b, 0, 0), memory_space=pltpu.VMEM)
    bias_spec = pl.BlockSpec((1, ps, ps), lambda j, b: (j, 0, 0), memory_space=pltpu.VMEM)

    kernel = functools.partial(kernel, seq=seq)
    out_shape = [jax.ShapeDtypeStruct((batch * groups, ps, dim), q.dtype)] * num_outputs
    out_specs: list = [spec] * num_outputs
    if extra:  # backward: append the accumulated dbias output
        out_shape.append(jax.ShapeDtypeStruct((groups, ps, ps), jnp.float32))
        out_specs.append(bias_spec)
    if len(out_shape) == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec, spec, spec, mask_spec, bias_spec] + [spec] * len(extra),
        out_specs=out_specs,
        interpret=interpret,
    )(_pack_slices(q, pack), _pack_slices(k, pack), _pack_slices(v, pack), valid,
      bias_exp, *[_pack_slices(e, pack) for e in extra])

    if num_outputs == 1 and not extra:
        return _unpack_slices(outs, batch, heads)
    *slices, dbias = outs
    return tuple(_unpack_slices(o, batch, heads) for o in slices) + (dbias,)


@functools.partial(jax.custom_vjp, nondiff_argnums=(5, 6))
def fused_bidir_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: jax.Array,
    bias_exp: jax.Array,
    interpret: bool = False,
    pack: int = 1,
) -> jax.Array:
    """Pallas-fused bidirectional attention with additive bias.

    Args:
        q, k, v: (B, S, H, D); q UNSCALED (T5 convention — fold any scale in).
        key_valid: (B, S) bool, True = valid key.
        bias_exp: (H/pack, pack*S, pack*S) fp32 from :func:`make_packed_bias`.
        pack: head slices per program (must divide H).

    Returns:
        (B, S, H, D). Differentiable in q/k/v/bias_exp (recompute backward;
        d_bias accumulated in-kernel across the batch).
    """
    return _launch_bidir(
        _bidir_fwd_kernel, 1, q, k, v, key_valid, bias_exp, interpret=interpret, pack=pack
    )


def _bidir_fwd(q: jax.Array, k: jax.Array, v: jax.Array, key_valid: jax.Array,
               bias_exp: jax.Array, interpret: bool, pack: int) -> Any:
    out = _launch_bidir(
        _bidir_fwd_kernel, 1, q, k, v, key_valid, bias_exp, interpret=interpret, pack=pack
    )
    return out, (q, k, v, key_valid, bias_exp)


def _bidir_bwd(interpret: bool, pack: int, residuals: tuple, g: jax.Array) -> tuple:
    q, k, v, key_valid, bias_exp = residuals
    dq, dk, dv, dbias = _launch_bidir(
        _bidir_bwd_kernel, 3, q, k, v, key_valid, bias_exp, extra=(g,),
        interpret=interpret, pack=pack,
    )
    return dq, dk, dv, None, dbias.astype(bias_exp.dtype)


fused_bidir_attention.defvjp(_bidir_fwd, _bidir_bwd)


def xla_bidir_attention(
    q: jax.Array, k: jax.Array, v: jax.Array, key_valid: jax.Array, bias: jax.Array
) -> jax.Array:
    """Unfused oracle: softmax(QK^T + bias + key mask) V, (B, S, H, D) I/O.

    ``bias``: (H, S, S) fp32 (UNexpanded). Mirrors the Chronos encoder's XLA
    attention math (``models/chronos.py``) for kernel validation.
    """
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits + bias[None]
    logits = jnp.where(key_valid[:, None, None, :], logits, _NEG_INF)
    w = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", w, v, preferred_element_type=jnp.float32).astype(q.dtype)


def bidir_pack(seq_padded: int, heads: int, dim: int) -> int | None:
    """Pack factor for the Chronos encoder geometry, or None for XLA.

    Mirrors ``ops.attention.pallas_pack``'s ~512-row target (v5e fwd+bwd
    micro-bench optimum); requires the padded per-slice length to hit the
    8-sublane rule and head_dim <= 256.

    OPT-IN (``MTT_CHRONOS_FUSED_ATTN=1``): the fused path measured a **-24%
    end-to-end loss** on the chronos_mm_h32 workload (2,961 -> 2,241
    series/s back-to-back on v5e, docs/PERF.md r4) despite passing
    ``--kernel-check`` exactly — the same custom-VJP-residual-through-the-
    scan cost that sank the causal small-S packing (``pallas_pack``), plus
    the per-layer padded q/k/v copies. Kept as a validated capability for
    future geometries (more heads / longer patched contexts).
    """
    from multimodal_timesfm_tpu.ops.attention import _FORCE_XLA, is_tpu_backend

    if _FORCE_XLA or not is_tpu_backend():
        return None
    if seq_padded % 8 or dim > 256 or seq_padded > 1024:
        return None
    import os

    if os.environ.get("MTT_CHRONOS_FUSED_ATTN", "0").lower() not in ("1", "true", "yes"):
        return None
    pack = 1
    for cand in range(1, heads + 1):
        if heads % cand == 0 and cand * seq_padded <= 512:
            pack = cand
    # Tile-starved lone slices lose to XLA (causal micro-bench: S=64 pack=1
    # 0.65x at realistic batch); require at least two MXU row tiles.
    return pack if pack * seq_padded >= 256 else None
