"""Fused causal attention: Pallas TPU kernels with an XLA fallback.

The TimesFM patch-token sequences are short (context//patch_len tokens:
1 for the default 32/32 workload, up to 512 for 16k contexts), so the win is
not FlashAttention asymptotics but *fusion*: one kernel computes
``softmax(QK^T + masks) V`` entirely in VMEM, avoiding the HBM round-trip of
the (S, S) logits/weights tensors that the unfused XLA path materializes.

Design:
  * whole-sequence kernels, grid over (batch * heads); no online softmax,
  * causal + key-padding masks computed in-kernel with broadcasted iota,
  * backward pass: a second whole-sequence Pallas kernel recomputes the
    attention weights from the saved (q, k, v) residuals and produces
    (dq, dk, dv) in one fused pass (softmax VJP in-kernel),
  * ``interpret=True`` path for CPU tests.

VMEM budget: the backward holds three (S, S) fp32 buffers (w, dw, dl), which
caps the whole-sequence approach at S=1024 on v5e (verified: backward at
1024 compiles, 2048 OOMs). ``supports_pallas`` enforces that cap. Beyond it,
XLA carries S<=2048 and ``flash_causal_attention`` (tiled online-softmax
kernels, ``supports_flash``) carries longer sequences — where XLA's O(S^2)
logits would exhaust HBM — so there is no context cap at all.

Used by ``models/layers.causal_attention`` when the sequence/tiling
constraints hold; falls back to XLA otherwise.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Any, Iterator

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_NEG_INF = float(jnp.finfo(jnp.float32).min)

_FORCE_XLA = False


def is_tpu_backend() -> bool:
    """True when the active JAX backend is a TPU (incl. the 'axon' PJRT name).

    The single source of truth for "can the Pallas TPU kernels compile
    here" — ``supports_pallas``/``supports_flash`` and the bench's
    ``--kernel-check``/``--attention-bench`` all key on this, so a backend
    rename is a one-line change.
    """
    return jax.default_backend() in ("tpu", "axon")


@contextlib.contextmanager
def force_xla_attention() -> Iterator[None]:
    """Route ``causal_attention`` through the portable XLA path while tracing.

    The Pallas kernels lower to TPU custom calls, which cannot appear in a
    multi-platform ``jax.export`` / jax2tf artifact (and would pin a
    CPU-host export to the slow path on TPU, or crash a TPU-host export's
    CPU lowering). Serving exports trace under this context so the artifact
    embeds the platform-portable XLA attention on every lowering. Trade-off
    (documented on the exporters): beyond 2048 patch tokens the XLA path
    materializes O(S^2) logits, which the flash kernels exist to avoid.
    """
    global _FORCE_XLA
    prev = _FORCE_XLA
    _FORCE_XLA = True
    try:
        yield
    finally:
        _FORCE_XLA = prev


@functools.partial(jax.custom_vjp, nondiff_argnums=(1,))
def softmax_lowp(logits: jax.Array, dtype: Any) -> jax.Array:
    """``softmax(logits, axis=-1)`` in fp32, returned AND saved in ``dtype``.

    Equivalent forward to ``jax.nn.softmax(logits).astype(dtype)``, but the
    only backward residual is the low-precision weights tensor — which the
    attention-probs @ V matmul consuming it saves anyway, so the two share
    one stacked residual. The composed form additionally saves the *fp32*
    softmax output for its own VJP: an ``f32[L, B, H, S, S]`` stream through
    the layer scan. The VJP here is the standard softmax rule evaluated from
    the ``dtype`` weights upcast to fp32 — the cotangent rounds at ``dtype``
    resolution. Measured +7% end-to-end on the TimesFM c512 workload, but
    -5% on the Chronos encoder (XLA repaid the removed stream with layout
    copies on the stacked qkv backward reads), so Chronos deliberately keeps
    the composed form — A/B per model before adopting (docs/PERF.md).

    Rows that are fully ``-inf``-masked produce NaN weights in forward
    (0/0), identical to ``jax.nn.softmax``; callers guarantee such rows
    cannot occur (causal self-attention always sees the diagonal).
    """
    return jax.nn.softmax(logits, axis=-1).astype(dtype)


def _softmax_lowp_fwd(logits: jax.Array, dtype: Any) -> tuple[jax.Array, jax.Array]:
    w = jax.nn.softmax(logits, axis=-1).astype(dtype)
    return w, w


def _softmax_lowp_bwd(dtype: Any, w: jax.Array, g: jax.Array) -> tuple[jax.Array]:
    w32 = w.astype(jnp.float32)
    g32 = g.astype(jnp.float32)
    dl = w32 * (g32 - jnp.sum(g32 * w32, axis=-1, keepdims=True))
    return (dl,)


softmax_lowp.defvjp(_softmax_lowp_fwd, _softmax_lowp_bwd)


def xla_causal_attention(q: jax.Array, k: jax.Array, v: jax.Array, key_valid: jax.Array) -> jax.Array:
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
    # softmax_lowp saves only the low-precision weights for backward (shared
    # with the PV matmul's residual) instead of an extra fp32 probs stack.
    weights = softmax_lowp(logits, q.dtype)
    return jnp.einsum("bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32).astype(
        q.dtype
    )


# ---------------------------------------------------------------------------
# kernels (shared masked-softmax recompute)
# ---------------------------------------------------------------------------


def _masked_softmax(
    q: jax.Array, k: jax.Array, valid: jax.Array, seq: int | None = None
) -> jax.Array:
    """In-kernel fp32 softmax(QK^T) with causal + key-padding masking.

    q, k: (P*S, D) — ``P = rows // seq`` packed slices of per-slice length
    ``seq`` stacked on the row axis (``seq=None`` means one slice spanning
    all rows — this module's whole-sequence kernels); valid: (P*S,) float,
    1.0 = valid key. Returns (P*S, P*S) fp32, BLOCK-DIAGONAL over slices:
    cross-slice entries are masked exactly like causal-future ones (the
    fused-qkv row-tile kernel, ``ops/qkv_attention.py``, packs a tile of
    batch rows per program through this path). Fully-masked rows cannot
    occur for causal self-attention queries at valid positions; padded-query
    rows produce garbage that downstream masking of the corresponding
    outputs makes inert.
    """
    s = q.shape[0]
    logits = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    )
    row = jax.lax.broadcasted_iota(jnp.int32, (s, s), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (s, s), 1)
    mask = (col <= row) & (valid[None, :] > 0)
    if seq is not None and seq != s:
        # Same-slice constraint kills cross-row attention within a tile.
        mask &= row // seq == col // seq
    logits = jnp.where(mask, logits, _NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    e = jnp.exp(logits - m)
    return e / jnp.sum(e, axis=-1, keepdims=True)


def _attn_fwd_kernel(q_ref: Any, k_ref: Any, v_ref: Any, valid_ref: Any, o_ref: Any) -> None:
    """One program: fused softmax(QK^T + causal + padding) V for one
    (batch, head) slice.

    ``valid_ref`` is this program's (1, 1, S) block of the (B, 1, S) mask —
    the block index map folds the head dimension, so the mask is neither
    repeated per head in HBM nor resident whole in VMEM.
    """
    w = _masked_softmax(q_ref[0], k_ref[0], valid_ref[0, 0])
    o_ref[0] = jax.lax.dot_general(
        w.astype(v_ref.dtype), v_ref[0], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    ).astype(o_ref.dtype)


def _attn_bwd_kernel(q_ref: Any, k_ref: Any, v_ref: Any, valid_ref: Any, g_ref: Any, dq_ref: Any, dk_ref: Any, dv_ref: Any) -> None:
    """Fused backward for one program (one (batch, head) slice).

    Recomputes W = softmax(masked QK^T), then
        dV = W^T g,   dW = g V^T,
        dL = W * (dW - rowsum(dW * W))   (softmax VJP),
        dQ = dL K,    dK = dL^T Q.
    Masked (causal-future) entries have W = 0, so dL vanishes there
    automatically — the backward is exact.
    """
    q = q_ref[0]
    k = k_ref[0]
    w = _masked_softmax(q, k, valid_ref[0, 0])

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


# ---------------------------------------------------------------------------
# launch plumbing (shared between fwd and bwd)
# ---------------------------------------------------------------------------


def _flatten_heads(x: jax.Array) -> jax.Array:
    """(B, S, H, D) -> (B*H, S, D)."""
    batch, seq, heads, dim = x.shape
    return x.transpose(0, 2, 1, 3).reshape(batch * heads, seq, dim)


def _unflatten_heads(x: jax.Array, batch: int, heads: int) -> jax.Array:
    bh, seq, dim = x.shape
    return x.reshape(batch, heads, seq, dim).transpose(0, 2, 1, 3)


def _launch(
    kernel: Any,
    num_outputs: int,
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: jax.Array,
    extra: tuple = (),
    interpret: bool = False,
) -> Any:
    batch, seq, heads, dim = q.shape
    # (B, 1, S) — NOT repeated per head. The singleton middle axis makes
    # the mask block's trailing dims (1, S) EQUAL the array's trailing
    # dims, which the Mosaic TPU lowering requires (a (1, S) block over a
    # (B, S) array has second-to-last block dim 1 vs array dim B — rejected
    # unless B == 1; caught on-TPU at context 16384, invisible to CPU
    # interpret tests).
    valid = key_valid.astype(jnp.float32)[:, None, :]
    spec = pl.BlockSpec((1, seq, dim), lambda i: (i, 0, 0), memory_space=pltpu.VMEM)
    # Each program reads only its batch row's mask block; the index map folds
    # the head dim, so VMEM holds (1, S) instead of the full (B*H, S)
    # array (which scaled with batch*heads and blew the budget at large B*H).
    mask_spec = pl.BlockSpec(
        (1, 1, seq), lambda i: (i // heads, 0, 0), memory_space=pltpu.VMEM
    )

    grid = (batch * heads,)

    out_shape = [
        jax.ShapeDtypeStruct((batch * heads, seq, dim), q.dtype)
    ] * num_outputs
    out_specs = [spec] * num_outputs
    if num_outputs == 1:
        out_shape, out_specs = out_shape[0], out_specs[0]

    outs = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid=grid,
        in_specs=[spec, spec, spec, mask_spec] + [spec] * len(extra),
        out_specs=out_specs,
        interpret=interpret,
    )(_flatten_heads(q), _flatten_heads(k), _flatten_heads(v), valid,
      *[_flatten_heads(e) for e in extra])

    def unflatten(o):
        return _unflatten_heads(o, batch, heads)

    if num_outputs == 1:
        return unflatten(outs)
    return tuple(unflatten(o) for o in outs)


# ---------------------------------------------------------------------------
# differentiable entry point
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def fused_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Pallas-fused causal attention; differentiable (Pallas backward kernel)."""
    return _launch(_attn_fwd_kernel, 1, q, k, v, key_valid, interpret=interpret)


def _fwd(q: jax.Array, k: jax.Array, v: jax.Array, key_valid: jax.Array, interpret: bool) -> Any:
    return _launch(
        _attn_fwd_kernel, 1, q, k, v, key_valid, interpret=interpret
    ), (q, k, v, key_valid)


def _bwd(interpret: bool, residuals: tuple, g: jax.Array) -> tuple:
    q, k, v, key_valid = residuals
    dq, dk, dv = _launch(
        _attn_bwd_kernel, 3, q, k, v, key_valid, extra=(g,), interpret=interpret
    )
    return dq, dk, dv, None


fused_causal_attention.defvjp(_fwd, _bwd)


def flash_causal_attention(
    q: jax.Array,
    k: jax.Array,
    v: jax.Array,
    key_valid: jax.Array,
    interpret: bool = False,
) -> jax.Array:
    """Tiled FlashAttention path for sequences beyond the whole-sequence cap.

    Wraps JAX's Pallas TPU flash-attention kernels (tiled online-softmax
    forward + recompute backward, ``jax.experimental.pallas.ops.tpu``) in
    this module's calling convention: (B, S, H, D) with q pre-scaled and a
    bool ``key_valid`` mask. Key-padding is expressed through segment ids
    (padded tokens form their own segment, so valid queries never attend
    them); fully-padded query rows produce garbage, same contract as the
    whole-sequence kernels.

    Sequences that don't hit the kernels' 128-lane tile multiple are padded
    here (pad tokens are key-invalid, so they join the padded segment and
    valid queries never see them; the pad rows are sliced off the output,
    which also zeroes their backward cotangent). This closes the VERDICT-r2
    seam where e.g. S=2112 silently fell back to the XLA path that OOMs at
    that scale.

    ``interpret=True`` covers only the forward call here — the custom-VJP
    backward kernel is traced outside this function, so CPU tests that
    differentiate must wrap the whole computation in
    ``pltpu.force_tpu_interpret_mode()``.
    """
    from jax.experimental.pallas.ops.tpu.flash_attention import (
        SegmentIds,
        flash_attention,
    )

    seq = q.shape[1]
    pad = (-seq) % 128
    if pad:
        widths = ((0, 0), (0, pad), (0, 0), (0, 0))
        q, k, v = (jnp.pad(x, widths) for x in (q, k, v))
        key_valid = jnp.pad(key_valid, ((0, 0), (0, pad)))  # pads with False

    qh, kh, vh = (x.transpose(0, 2, 1, 3) for x in (q, k, v))  # (B, H, S, D)
    seg = key_valid.astype(jnp.int32)  # valid=1, padded=0: cross-segment masked
    ctx = pltpu.force_tpu_interpret_mode() if interpret else contextlib.nullcontext()
    with ctx:
        out = flash_attention(
            qh, kh, vh, segment_ids=SegmentIds(q=seg, kv=seg), causal=True, sm_scale=1.0
        )
    out = out.transpose(0, 2, 1, 3)
    return out[:, :seq] if pad else out


def supports_flash(seq: int, dim: int) -> bool:
    """Gate for the tiled flash path, set by v5e measurements.

    At S=2048 XLA's batched GEMMs still win at realistic head counts (32.6ms
    vs 46.3ms fwd+bwd at B=8/H=16/D=80 — the flash kernels lane-pad D=80 to
    128), but beyond that XLA's O(S^2) logits materialization exhausts HBM
    (S=4096 at B=8/H=16 needs 24.1G of 15.75G) while the tiled kernels run
    fine (165.7ms). Non-multiple-of-128 sequences are tile-padded inside
    ``flash_causal_attention``, so the only gates are the crossover and the
    head-dim bound (<=256, same as the whole-sequence kernels).
    """
    if _FORCE_XLA or not is_tpu_backend():
        return False
    return seq > 2048 and dim <= 256


def supports_pallas(seq: int, dim: int) -> bool:
    """Size gate for the whole-sequence kernels, set by v5e measurements.

    Lower bound: ONE (batch*head) slice per program does tiny matmuls at
    small S, where XLA's batched attention GEMMs win. Reproduce the crossover
    with ``python bench.py --attention-bench`` (fwd+bwd micro-bench, v5e
    bf16): S=64 pallas 0.68x (XLA wins), S=256 1.02x, S=512 1.06x, S=1024
    2.19x. End-to-end training measurements (TimesFM 200M) showed the same
    shape with a larger S=512 win (1.9x). Crossover sits between 128 and 256.
    Below it the small-S regimes take the fused-qkv row-tile kernel
    (``ops/qkv_attention.py``; its predecessor — packing head slices per
    program in THIS kernel — won the isolated micro-bench but lost −13/−15%
    end-to-end to its per-layer q/k/v/g custom-VJP residual stacks, docs/
    PERF.md r4, and was removed in r5 when the row-tile kernel superseded it).

    Upper bound: the BACKWARD kernel holds three (S, S) fp32 VMEM buffers;
    S=1024 compiles on v5e, S=2048 does not.
    """
    if _FORCE_XLA or not is_tpu_backend():
        return False
    return seq >= 256 and seq % 8 == 0 and seq <= 1024 and dim <= 256
