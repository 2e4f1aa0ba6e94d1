"""Core neural-net building blocks as pytree modules.

These are the TPU-native equivalents of the upstream torch internals the
reference adapters reach into (SURVEY.md §2.5): the residual patch-embedding
MLP (``tokenizer``), RMS/Layer norms, per-dim-scaled causal attention, and
the transformer blocks of ``stacked_xf``
(``/root/reference/src/tsfmx/tsfm/timesfm.py:73-98``).

Conventions:
  * params are nested dicts of ``jnp`` arrays,
  * every ``apply`` is shape-polymorphic in batch, static in feature dims,
  * matmuls pass ``preferred_element_type=float32`` so the MXU accumulates
    in fp32 even under bf16 params/activations,
  * padding masks are bool, True = padded (project convention,
    reference ``tsfm/base.py:16``).
"""

from __future__ import annotations

import math
from typing import Any

import jax
import jax.numpy as jnp

Params = dict[str, Any]

# 1/ln(2): the per-dim-scale constant used by PAX-lineage attention
# (softplus(0) * r_softplus_0 == 1 so zero-init is a no-op scale).
_R_SOFTPLUS_0 = 1.442695041


# ---------------------------------------------------------------------------
# initializers
# ---------------------------------------------------------------------------


def xavier_uniform(rng: jax.Array, shape: tuple[int, int], dtype: Any = jnp.float32) -> jax.Array:
    fan_in, fan_out = shape[0], shape[1]
    limit = math.sqrt(6.0 / (fan_in + fan_out))
    return jax.random.uniform(rng, shape, dtype, -limit, limit)


def init_dense(rng: jax.Array, in_dim: int, out_dim: int, bias: bool = True) -> Params:
    p: Params = {"kernel": xavier_uniform(rng, (in_dim, out_dim))}
    if bias:
        p["bias"] = jnp.zeros((out_dim,), jnp.float32)
    return p


def dense(params: Params, x: jax.Array) -> jax.Array:
    # Mixed-precision dots (bf16 activations x fp32 master weights) are left
    # to XLA; measured faster than casting kernels at use, which adds a full
    # conversion pass over the weights. For frozen subtrees the trainer can
    # store weights directly in bf16 (see ``frozen_cast_dtype``), halving
    # weight HBM traffic.
    y = jnp.dot(x, params["kernel"], preferred_element_type=jnp.float32)
    if "bias" in params:
        y = y + params["bias"]
    return y.astype(x.dtype)


# ---------------------------------------------------------------------------
# residual-lean activations
# ---------------------------------------------------------------------------


@jax.custom_vjp
def relu(x: jax.Array) -> jax.Array:
    """ReLU whose backward recomputes the mask from the saved *output*.

    ``jax.nn.relu``'s VJP saves the bool predicate ``x > 0`` as a residual;
    under a scanned transformer that predicate stacks into a
    ``bool[L, B, S, F]`` HBM stream written forward + read backward — the
    FFN's relu pred-mask stack measured at 4-8% of leaf device time on the
    c512/Chronos workloads (docs/PERF.md). But the relu *output* is already a
    residual of the down-projection matmul that consumes it, and the mask is
    recoverable from it exactly: ``relu(x) > 0  <=>  x > 0`` wherever the
    gradient is nonzero (at ``x <= 0`` both give cotangent 0, matching
    ``jax.nn.relu``'s convention at 0). Saving only the output makes the two
    consumers share one stacked residual and drops the bool stream entirely —
    numerically identical gradients.
    """
    return jnp.maximum(x, 0)


def _relu_fwd(x: jax.Array) -> tuple[jax.Array, jax.Array]:
    y = jnp.maximum(x, 0)
    return y, y


def _relu_bwd(y: jax.Array, g: jax.Array) -> tuple[jax.Array]:
    return (jnp.where(y > 0, g, jnp.zeros_like(g)),)


relu.defvjp(_relu_fwd, _relu_bwd)


# ---------------------------------------------------------------------------
# normalization
# ---------------------------------------------------------------------------


def init_rms_norm(dim: int) -> Params:
    return {"scale": jnp.zeros((dim,), jnp.float32)}


def rms_norm(params: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # A params dict WITHOUT "scale" means the learned gain was folded into
    # the downstream GEMM weights (fold_frozen_affines) — apply only the
    # normalization here.
    gain = params.get("scale")
    if x.dtype == jnp.float32:
        var = jnp.mean(x * x, axis=-1, keepdims=True)
        normed = x * jax.lax.rsqrt(var + eps)
        return normed if gain is None else normed * (1.0 + gain)
    # Low-precision path: accumulate the variance in fp32 but keep every
    # (..., D)-sized intermediate in x.dtype. The naive upcast-first version
    # makes autodiff save TWO fp32 copies of x per norm as residuals — under
    # a scanned transformer these stack into f32[L, B, S, D] HBM streams
    # written forward + read backward (measured ~11% of Chronos step time;
    # see docs/PERF.md). Here the saved tensors are x (already live) and one
    # x.dtype product; only the (..., 1) inverse scale is new. Squaring in
    # x.dtype before the fp32 mean keeps the multiply's saved operand in
    # x.dtype AND avoids an einsum contraction that XLA lowers ~2.3x slower
    # than a plain multiply-reduce at transformer geometries (measured
    # 687us -> 289us fwd+bwd at (128, 67, 768) on v5e); the squared terms
    # lose ~0.4% relative each, on par with the bf16 rounding of the
    # inverse scale itself.
    var = jnp.mean((x * x).astype(jnp.float32), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    if gain is None:
        return x * inv
    # Apply the learned gain in fp32 with ONE final cast: casting the gain
    # itself to bf16 first would snap (1 + scale) to a ~0.004 grid, silently
    # zeroing learned per-feature deviations below ~0.2% (coherent, not
    # stochastic). The f32 product is no one's residual — the multiply saves
    # its x.dtype operand and the (D,) gain — so no f32[L, B, S, D] stream
    # returns (pinned by the scanned-jaxpr test).
    return ((x * inv) * (1.0 + gain)).astype(x.dtype)


def init_layer_norm(dim: int) -> Params:
    return {"scale": jnp.ones((dim,), jnp.float32), "bias": jnp.zeros((dim,), jnp.float32)}


def layer_norm(params: Params, x: jax.Array, eps: float = 1e-6) -> jax.Array:
    # Empty params = the learned affine was folded into the downstream GEMM
    # (fold_frozen_affines): standardize only.
    scale, bias = params.get("scale"), params.get("bias")
    if x.dtype == jnp.float32:
        mu = jnp.mean(x, axis=-1, keepdims=True)
        var = jnp.var(x, axis=-1, keepdims=True)
        std = (x - mu) * jax.lax.rsqrt(var + eps)
        return std if scale is None else std * scale + bias
    # Low-precision path: fp32 moment accumulation, x.dtype intermediates
    # (see rms_norm — including why the reductions are plain multiply-means,
    # not einsum contractions). Centering before the variance reduction
    # keeps it two-pass-stable; ``centered`` is a backward residual for the
    # output multiply anyway, so it adds no stream the fp32 version didn't.
    mu32 = jnp.mean(x.astype(jnp.float32), axis=-1, keepdims=True)
    centered = x - mu32.astype(x.dtype)
    var = jnp.mean((centered * centered).astype(jnp.float32), axis=-1, keepdims=True)
    inv = jax.lax.rsqrt(var + eps).astype(x.dtype)
    if scale is None:
        return centered * inv
    # fp32 scale/bias application, one final cast — see rms_norm.
    return ((centered * inv) * scale + bias).astype(x.dtype)


# ---------------------------------------------------------------------------
# residual block (the TSFM patch-embedding MLP)
# ---------------------------------------------------------------------------


def init_residual_block(rng: jax.Array, in_dim: int, hidden_dim: int, out_dim: int) -> Params:
    """Residual MLP: out = W_out(swish(W_hid(x))) + W_res(x).

    Mirrors the structure of the upstream TimesFM ``ResidualBlock`` that the
    reference feeds ``[normed_patch, mask]`` into (``tsfm/timesfm.py:73-74``).
    """
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "hidden": init_dense(k1, in_dim, hidden_dim),
        "output": init_dense(k2, hidden_dim, out_dim),
        "residual": init_dense(k3, in_dim, out_dim),
    }


def residual_block(params: Params, x: jax.Array, act: Any = jax.nn.swish) -> jax.Array:
    h = act(dense(params["hidden"], x))
    return dense(params["output"], h) + dense(params["residual"], x)


# ---------------------------------------------------------------------------
# attention
# ---------------------------------------------------------------------------


def init_attention(rng: jax.Array, model_dims: int, num_heads: int, head_dim: int) -> Params:
    k1, k2 = jax.random.split(rng)
    return {
        "qkv": init_dense(k1, model_dims, 3 * num_heads * head_dim),
        "out": init_dense(k2, num_heads * head_dim, model_dims),
        # PAX-style learned per-dim query scale; zero init => scale 1/sqrt(d).
        "per_dim_scale": jnp.zeros((head_dim,), jnp.float32),
    }


def _scale_query(q: jax.Array, per_dim_scale: jax.Array, head_dim: int) -> jax.Array:
    scale = (_R_SOFTPLUS_0 / math.sqrt(head_dim)) * jax.nn.softplus(per_dim_scale)
    # fp32 multiply, one final cast — learned per-dim deviations below bf16
    # resolution still move the product (see rms_norm).
    return (q * scale).astype(q.dtype)


def causal_attention(
    params: Params,
    x: jax.Array,
    paddings: jax.Array,
    num_heads: int,
    head_dim: int,
) -> jax.Array:
    """Multi-head causal self-attention with key-padding masking.

    Uses the Pallas fused kernel (``ops/attention.py``) when the sequence
    meets its tiling constraints on TPU; otherwise the XLA path.

    Args:
        x: (B, N, D) hidden states.
        paddings: (B, N) bool, True = padded token.

    Returns:
        (B, N, D).
    """
    from multimodal_timesfm_tpu.ops.attention import (
        flash_causal_attention,
        fused_causal_attention,
        supports_flash,
        supports_pallas,
        xla_causal_attention,
    )

    batch, seq, _ = x.shape
    if "vo" in params:
        # Folded frozen attention (fold_seq1_attention): at seq==1 the whole
        # block collapses to one (D, D) GEMM. Valid ONLY at a single causal
        # position — the fold pre-multiplied softmax-identity semantics in.
        if seq != 1:
            raise ValueError(
                f"attention params were folded for seq==1 (fold_seq1_attention) "
                f"but got seq={seq}; rebuild the model with unfolded params for "
                "multi-token contexts"
            )
        return dense(params["vo"], x)
    if seq == 1:
        # Single causal position: softmax over one key is identity, so
        # attention output == v and the q/k projections are dead compute —
        # their grads are identically zero too (the softmax is constant in
        # them), exactly as in the general path. Dot only the v third of the
        # fused qkv kernel (column-slicing a GEMM's weights equals slicing
        # its output), cutting the attention GEMM FLOPs 3x in forward AND
        # backward on the reference's default 32-step (1 patch token)
        # workload — the headline-bench path.
        hd = num_heads * head_dim
        v_proj = {"kernel": params["qkv"]["kernel"][:, 2 * hd :]}
        if "bias" in params["qkv"]:
            v_proj["bias"] = params["qkv"]["bias"][2 * hd :]
        out = dense(v_proj, x)
        return dense(params["out"], out.astype(x.dtype))

    # Split the fused qkv output with LAST-axis (contiguous) slices. The
    # previous reshape-to-(B,S,3,H,D) + middle-axis indexing forced strided
    # layout copies: the r3 c512 trace showed two ~220us transpose fusions +
    # copies per layer-step (~20% of device time) just shuffling qkv. Column
    # blocks [0:HD]=q, [HD:2HD]=k, [2HD:3HD]=v — same packing the seq==1
    # fast path slices from the kernel.
    hd = num_heads * head_dim
    qkv = dense(params["qkv"], x)  # (B, S, 3*H*D)

    from multimodal_timesfm_tpu.ops.qkv_attention import (
        fused_qkv_causal_attention,
        supports_qkv_fused,
    )

    if supports_qkv_fused(seq, num_heads, head_dim):
        # Small-S fused path: the kernel consumes qkv in its NATURAL layout
        # and emits (B, S, H*D) for the out projection — no slice/transpose
        # copies, no probs residual (the backward recomputes the weights
        # from the saved qkv). The r5 traces measured the XLA attention
        # middle these ops form at ~25-30% of device time on the 16/64-token
        # workloads (docs/PERF.md).
        if "per_dim_scale" in params:
            scale = (_R_SOFTPLUS_0 / math.sqrt(head_dim)) * jax.nn.softplus(
                params["per_dim_scale"]
            )
            mult = jnp.tile(scale, num_heads).astype(jnp.float32)
            qkv = jnp.concatenate(
                [(qkv[..., :hd] * mult).astype(qkv.dtype), qkv[..., hd:]], axis=-1
            )
        out = fused_qkv_causal_attention(qkv, ~paddings, num_heads, head_dim)
        return dense(params["out"], out.astype(x.dtype))

    q = qkv[..., :hd].reshape(batch, seq, num_heads, head_dim)
    k = qkv[..., hd : 2 * hd].reshape(batch, seq, num_heads, head_dim)
    v = qkv[..., 2 * hd :].reshape(batch, seq, num_heads, head_dim)
    # Absent per_dim_scale = fold_frozen_affines pre-multiplied the
    # softplus'd scale into the q column block of the frozen qkv kernel;
    # q arrives pre-scaled and the elementwise pass is gone.
    if "per_dim_scale" in params:
        q = _scale_query(q, params["per_dim_scale"], head_dim)
    key_valid = ~paddings  # (B, N)
    if supports_pallas(seq, head_dim):
        out = fused_causal_attention(q, k, v, key_valid, False)
    elif supports_flash(seq, head_dim):
        out = flash_causal_attention(q, k, v, key_valid)
    else:
        out = xla_causal_attention(q, k, v, key_valid)
    out = out.reshape(batch, seq, num_heads * head_dim).astype(x.dtype)
    return dense(params["out"], out)


def fold_seq1_attention(stacked: Params) -> Params:
    """Fold each layer's frozen attention into one (D, D) matrix for seq==1.

    At a single causal position the softmax runs over one key, so attention
    output == v exactly and the block is ``out(v(x)) = x @ (Wv @ Wo) + (bv @
    Wo + bo)`` — two back-to-back linear maps with nothing between them. For
    a FROZEN backbone (multimodal mode trains only the fusion MLP) the
    product can be taken once per run in fp32, halving the attention GEMM
    FLOPs AND weight HBM reads in forward and the input-grad backward on the
    reference-default 32/32 workload (1 patch token — the headline bench
    path). Invalid for training the backbone (the factors are the trainable
    parameters) and for seq > 1 (``causal_attention`` raises).

    Args:
        stacked: a ``stacked_xf`` pytree from ``init_stacked_layers`` —
            every leaf carries a leading layer axis.

    Returns:
        A new stacked tree where each layer's ``attn`` is ``{"vo": dense}``;
        ``qkv``/``out``/``per_dim_scale`` (dead at seq==1: the query scale
        only feeds the softmax, which is constant) are dropped.
    """
    attn = stacked["attn"]
    if "vo" in attn:
        # Already folded: composing trainer + sweep paths must not double-fold
        # (the factors were dropped, so re-folding would KeyError confusingly).
        return stacked
    out_kernel = attn["out"]["kernel"]  # (L, H*D, md)
    hd = out_kernel.shape[1]
    wv = attn["qkv"]["kernel"][:, :, 2 * hd :]  # (L, md, H*D)
    # fp32-accumulate the fold products even for bf16-stored trees (module
    # matmul convention), then return the tree's own dtype.
    vo: Params = {
        "kernel": jnp.einsum(
            "ldh,lhm->ldm", wv, out_kernel, preferred_element_type=jnp.float32
        ).astype(out_kernel.dtype)
    }
    bias = attn["out"].get("bias")
    if "bias" in attn["qkv"]:
        bv = attn["qkv"]["bias"][:, 2 * hd :]  # (L, H*D)
        folded_bv = jnp.einsum(
            "lh,lhm->lm", bv, out_kernel, preferred_element_type=jnp.float32
        ).astype(out_kernel.dtype)
        bias = folded_bv if bias is None else bias + folded_bv
    if bias is not None:
        vo["bias"] = bias
    folded = dict(stacked)
    folded["attn"] = {"vo": vo}
    return folded


def fold_frozen_affines(stacked: Params) -> Params:
    """Fold each frozen layer's elementwise affines into its GEMM weights.

    For a FROZEN transformer stack (multimodal mode trains only the fusion
    MLP) three per-layer elementwise passes are exact linear rewrites of the
    adjacent projection weights, so they can be pre-multiplied once per run
    in fp32 — same family as :func:`fold_seq1_attention` (+25.7% headline,
    docs/PERF.md), but valid at ANY sequence length:

      1. the RMS-norm gain: ``(n(x) * g) @ W == n(x) @ (diag(g) W)`` — the
         gain rows fold into the attention input projection (``qkv``, or the
         already-folded ``vo``),
      2. the PAX per-dim query scale: ``(h @ Wq) * s == h @ (Wq diag(s~))``
         with the softplus'd scale tiled across heads — folds into the q
         column block (and q bias), deleting the ``_scale_query`` pass,
      3. the LayerNorm affine: ``(std(x) * a + b) @ W == std(x) @ (diag(a) W)
         + b @ W`` — scale and bias fold into ``ffn_up``'s kernel and bias.

    The folded tree's norms carry EMPTY param dicts (``rms_norm`` /
    ``layer_norm`` then standardize only) and ``per_dim_scale`` is dropped;
    outputs and input-gradients are bit-comparable up to fp32 re-association.
    Invalid when the stack is trained (the factors are parameters).
    Idempotent: an already-folded tree is returned unchanged.
    """
    if "scale" not in stacked.get("attn_norm", {}):
        return stacked  # already folded (composes with trainer/sweep paths)
    # jnp.asarray throughout: the tree may arrive numpy-backed (e.g. a
    # device_get'd checkpoint) and the .at[] updates below are jax-only.
    folded = dict(stacked)
    attn = dict(stacked["attn"])

    # --- 1) rms gain rows into the attention input projection ------------
    gain = 1.0 + jnp.asarray(stacked["attn_norm"]["scale"], jnp.float32)  # (L, D)
    if "vo" in attn:
        vo = dict(attn["vo"])
        vo["kernel"] = (jnp.asarray(vo["kernel"], jnp.float32) * gain[:, :, None]).astype(
            attn["vo"]["kernel"].dtype
        )
        attn["vo"] = vo
    else:
        qkv = dict(attn["qkv"])
        kern = jnp.asarray(qkv["kernel"], jnp.float32) * gain[:, :, None]
        # --- 2) per-dim query scale into the q column block --------------
        if "per_dim_scale" in attn:
            hd = attn["out"]["kernel"].shape[1]  # H * head_dim
            pds = jnp.asarray(attn.pop("per_dim_scale"), jnp.float32)  # (L, head_dim)
            head_dim = pds.shape[-1]
            s = (_R_SOFTPLUS_0 / math.sqrt(head_dim)) * jax.nn.softplus(pds)
            tiled = jnp.tile(s, (1, hd // head_dim))  # (L, H*head_dim)
            kern = kern.at[:, :, :hd].multiply(tiled[:, None, :])
            if "bias" in qkv:
                bias = jnp.asarray(qkv["bias"], jnp.float32)
                bias = bias.at[:, :hd].multiply(tiled)
                qkv["bias"] = bias.astype(attn["qkv"]["bias"].dtype)
        qkv["kernel"] = kern.astype(attn["qkv"]["kernel"].dtype)
        attn["qkv"] = qkv
    folded["attn"] = attn
    folded["attn_norm"] = {}

    # --- 3) layer_norm affine into ffn_up ---------------------------------
    ln = stacked["ffn_norm"]
    up = dict(stacked["ffn_up"])
    w32 = jnp.asarray(up["kernel"], jnp.float32)  # (L, D, F)
    new_kernel = w32 * jnp.asarray(ln["scale"], jnp.float32)[:, :, None]
    ln_bias_term = jnp.einsum(
        "ld,ldf->lf", jnp.asarray(ln["bias"], jnp.float32), w32,
        preferred_element_type=jnp.float32,
    )
    new_bias = ln_bias_term + (
        jnp.asarray(up["bias"], jnp.float32) if "bias" in up else 0.0
    )
    up["kernel"] = new_kernel.astype(stacked["ffn_up"]["kernel"].dtype)
    up["bias"] = new_bias.astype(
        stacked["ffn_up"].get("bias", stacked["ffn_up"]["kernel"]).dtype
    )
    folded["ffn_up"] = up
    folded["ffn_norm"] = {}
    return folded


def fold_frozen_tree_affines(frozen: Params) -> Params | None:
    """Apply :func:`fold_frozen_affines` to a frozen params *tree*.

    Same structural gate as :func:`fold_frozen_tree_seq1`: folds
    ``frozen["adapter"]["stacked_xf"]`` when the tree is TimesFM-shaped,
    returns ``None`` otherwise (e.g. Chronos — its T5 encoder has a
    different norm wiring). Mode gating (the stack must actually be frozen)
    is the caller's responsibility.
    """
    adapter = frozen.get("adapter")
    if not (isinstance(adapter, dict) and "stacked_xf" in adapter):
        return None
    adapter = dict(adapter)
    adapter["stacked_xf"] = fold_frozen_affines(adapter["stacked_xf"])
    out = dict(frozen)
    out["adapter"] = adapter
    return out


def fold_frozen_tree_seq1(frozen: Params) -> Params | None:
    """Apply :func:`fold_seq1_attention` to a frozen params *tree*.

    Folds ``frozen["adapter"]["stacked_xf"]`` when the tree is TimesFM-shaped
    (a stacked scanned layer stack lives under the adapter); returns ``None``
    for any other shape (e.g. a Chronos adapter tree) so callers can gate the
    fold structurally without knowing the backbone. Geometry gating — every
    context the tree will see must be exactly one patch token — remains the
    CALLER's responsibility (``MultimodalTrainer`` and the vectorized sweep
    driver both check context_len == patch_len before calling).
    """
    adapter = frozen.get("adapter")
    if not (isinstance(adapter, dict) and "stacked_xf" in adapter):
        return None
    adapter = dict(adapter)
    adapter["stacked_xf"] = fold_seq1_attention(adapter["stacked_xf"])
    out = dict(frozen)
    out["adapter"] = adapter
    return out


# ---------------------------------------------------------------------------
# transformer layer & stacked (scanned) layers
# ---------------------------------------------------------------------------


def init_transformer_layer(
    rng: jax.Array, model_dims: int, num_heads: int, head_dim: int, ffn_dims: int
) -> Params:
    k1, k2, k3 = jax.random.split(rng, 3)
    return {
        "attn_norm": init_rms_norm(model_dims),
        "attn": init_attention(k1, model_dims, num_heads, head_dim),
        "ffn_norm": init_layer_norm(model_dims),
        "ffn_up": init_dense(k2, model_dims, ffn_dims),
        "ffn_down": init_dense(k3, ffn_dims, model_dims),
    }


def transformer_layer(
    params: Params,
    x: jax.Array,
    paddings: jax.Array,
    num_heads: int,
    head_dim: int,
) -> jax.Array:
    """Pre-norm causal transformer block.

    Wiring follows the upstream TimesFM torch decoder layer the reference
    iterates over (``tsfm/timesfm.py:95-98``): RMS-norm -> per-dim-scaled
    causal attention -> residual; LayerNorm -> FFN(relu) -> padding-zeroed
    residual.
    """
    h = rms_norm(params["attn_norm"], x)
    x = x + causal_attention(params["attn"], h, paddings, num_heads, head_dim)

    h = layer_norm(params["ffn_norm"], x)
    h = dense(params["ffn_down"], relu(dense(params["ffn_up"], h)))
    h = h * (~paddings)[..., None].astype(h.dtype)
    return x + h


def init_stacked_layers(
    rng: jax.Array,
    num_layers: int,
    model_dims: int,
    num_heads: int,
    head_dim: int,
    ffn_dims: int,
) -> Params:
    """Init ``num_layers`` transformer layers, stacked on a leading axis for lax.scan."""
    keys = jax.random.split(rng, num_layers)
    layers = [init_transformer_layer(k, model_dims, num_heads, head_dim, ffn_dims) for k in keys]
    return jax.tree.map(lambda *xs: jnp.stack(xs), *layers)


def stacked_transformer(
    params: Params,
    x: jax.Array,
    paddings: jax.Array,
    num_heads: int,
    head_dim: int,
    unroll: int | bool = 1,
    remat: bool = False,
) -> jax.Array:
    """Run the whole stack as one ``lax.scan`` over stacked layer params.

    One compiled layer body reused L times: compile time stays flat in depth
    and XLA double-buffers the per-layer weights from HBM. ``unroll`` unrolls
    the scan body (lets XLA fuse across layer boundaries at higher compile
    cost). ``remat`` checkpoints the layer body: backward recomputes
    activations instead of saving per-layer residuals through the scan —
    trades ~1/3 more FLOPs for the residual-stacking HBM traffic and enables
    long-context training past activation-memory limits.
    """

    def body(h, layer_params):
        return transformer_layer(layer_params, h, paddings, num_heads, head_dim), None

    if remat:
        body = jax.checkpoint(body)
    out, _ = jax.lax.scan(body, x, params, unroll=unroll)
    return out
