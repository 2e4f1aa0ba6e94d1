"""Chronos-2 backbone in JAX, and its adapter.

Re-derivation of the ``Chronos2Model`` internals the reference adapter
reaches into (SURVEY.md §2.5; reference
``/root/reference/src/tsfmx/tsfm/chronos.py:16-207``):

  * ``instance_norm``                — masked loc/scale standardization + inverse
  * ``_prepare_patched_context``    — normalize, patch, time-encode
  * ``input_patch_embedding``       — residual MLP over [time_enc, values, mask]
  * ``shared`` + ``reg_token_id``   — learned [REG] token embedding table
  * ``encoder(inputs_embeds, group_ids, attention_mask)`` — T5-style
    encoder-only stack (RMSNorm pre-norm, relative position bias, ReLU FFN)
  * ``output_patch_embedding``      — residual MLP -> quantiles x patch
  * config fields input_patch_size / output_patch_size / max_output_patches /
    time_encoding_scale / use_reg_token / quantiles / model_dim

120M geometry assumption (upstream source unavailable offline; all knobs are
config): model_dim 768, 16 layers, 12 heads, ffn 3072, patch 16/16, 9 decile
quantiles (0.5 at index 4 = ``point_forecast_index``, matching the
reference's ``quantiles.index(0.5)`` at ``chronos.py:33``).

Group semantics: the reference adapter always passes ``group_ids =
arange(B)`` (``chronos.py:117``), i.e. every sample is its own attention
group — the default here (per-row bidirectional attention with key-padding
masks) is exactly that contract. ``Chronos2Adapter.forward(..., pack=k)``
additionally exposes the underlying grouping mechanism: k series packed into
one encoder row as k attention segments, numerically identical to per-row
attention (see ``forward`` docstring and ``tests/test_chronos.py``).

Adapter semantics parity (reference ``chronos.py:35-169``):
  * preprocess flips masks to Chronos convention (1.0 = valid), returns
    embeddings + per-patch pad masks + (loc, scale),
  * forward builds zero future patches with linear time encodings
    ``arange(H)/time_encoding_scale``, embeds them with the same patch
    embedding, prepends the [REG] token embedding, runs the encoder, and
    returns the last ``max_output_patches`` hidden states,
  * postprocess projects to quantiles, reshapes (B,P,Q,S)->(B,Q,P*S),
    inverse-normalizes, slices the horizon -> (B, horizon, Q); horizon
    beyond ``max_output_patches * output_patch_size`` raises.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from multimodal_timesfm_tpu.models import layers as L
from multimodal_timesfm_tpu.models.base import Params, PreprocessResult, TsfmAdapter

_SCALE_EPS = 1e-10


@dataclasses.dataclass(frozen=True)
class Chronos2Config:
    """Architecture hyperparameters. Defaults = assumed 120M geometry.

    Fine-tuning efficiency note: the encoder always processes
    ``max_output_patches`` future-patch queries (reference behavior,
    ``chronos.py:78-99``). The output head's weights are shared across patch
    positions, so setting ``max_output_patches = ceil(horizon /
    output_patch_size)`` for a fixed-horizon fine-tune still LOADS the
    pretrained weights and cuts encoder work substantially — measured 7.4x
    training throughput on v5e at horizon 32 (17.7k series/s at mop=2 vs
    2.4k at the default 64). It is NOT checkpoint-equivalent, though: the
    dropped future patches were bidirectional-attention keys, so outputs
    differ from the checkpoint's default behavior. Parity evals must pin mop
    to the checkpoint's own value — see PARITY.md "max_output_patches
    semantics" and the differing-outputs test in ``tests/test_chronos.py``.
    """

    model_dim: int = 768
    num_layers: int = 16
    num_heads: int = 12
    ffn_dim: int = 3072
    input_patch_size: int = 16
    output_patch_size: int = 16
    max_output_patches: int = 64
    time_encoding_scale: float = 1000.0
    use_reg_token: bool = True
    reg_token_id: int = 0
    vocab_size: int = 2  # tiny special-token table ("shared")
    quantiles: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    rel_pos_buckets: int = 32
    rel_pos_max_distance: int = 128
    # Default attention packing for ``forward`` (segment-grouped rows, see
    # ``forward(pack=...)``). Numerically identical to pack=1; packing k tiny
    # per-series attention problems into one row amortizes the TPU's lane
    # padding. Measured on v5e: pays ONLY when per-row sequences are tiny —
    # ~1.5-1.7x end-to-end (across sessions; ±15% infra variance) at pack=16
    # for the mop=2 fine-tune geometry (5 tokens/row), but LOSES at the
    # default mop=64 (67 tokens/row: pack=2 is
    # -20%, the O(s^2) attention growth dominates). Batch sizes must be
    # divisible by ``pack``.
    pack: int = 1
    # Checkpoint the encoder layer body: the backward recomputes activations
    # instead of streaming the per-layer residual stack (the r3 trace showed
    # ~2x f32[L,B,S,768] buffers written fwd + read bwd) — trades FLOPs for
    # HBM traffic. Measured impractical on the remote-compile deployment:
    # checkpoint-inside-scan inside the fused multi-epoch program exceeded a
    # 30-minute compile (r3 A/B DNF); default off, useful where compiles are
    # local or memory pressure forces it.
    remat: bool = False
    compute_dtype: Any = jnp.float32

    def __post_init__(self) -> None:
        # _relative_bucket's log branch divides by max_exact = num // 2 with
        # num = buckets // 2: below 4 buckets that is a division by zero whose
        # NaN indices the bias gather silently clamps to wrong buckets.
        if self.rel_pos_buckets < 4:
            raise ValueError(f"rel_pos_buckets must be >= 4, got {self.rel_pos_buckets}")
        # The architecture ties the two patch sizes: future placeholder
        # patches are built at output_patch_size but embedded by the SAME
        # input_patch_embedding as context patches (reference chronos.py:
        # 82-99; the checkpoint pins both to 16). Unequal sizes would fail
        # deep inside forward with an opaque dot_general shape error.
        if self.input_patch_size != self.output_patch_size:
            raise ValueError(
                "Chronos-2 requires input_patch_size == output_patch_size "
                f"(got {self.input_patch_size} != {self.output_patch_size}): "
                "the shared input_patch_embedding embeds both context and "
                "future patches. Adjust the horizon via max_output_patches."
            )

    @property
    def num_quantiles(self) -> int:
        return len(self.quantiles)

    @property
    def head_dim(self) -> int:
        return self.model_dim // self.num_heads

    @classmethod
    def tiny(cls) -> "Chronos2Config":
        return cls(
            model_dim=32,
            num_layers=2,
            num_heads=2,
            ffn_dim=64,
            input_patch_size=4,
            output_patch_size=4,
            max_output_patches=4,
        )


# ---------------------------------------------------------------------------
# instance norm (masked loc/scale)
# ---------------------------------------------------------------------------


def instance_norm_stats(context: jax.Array, valid: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Masked mean/std over the valid context points. Returns (loc, scale), each (B, 1)."""
    valid = valid.astype(context.dtype)
    n = jnp.maximum(jnp.sum(valid, axis=-1, keepdims=True), 1.0)
    loc = jnp.sum(context * valid, axis=-1, keepdims=True) / n
    var = jnp.sum(valid * (context - loc) ** 2, axis=-1, keepdims=True) / n
    scale = jnp.sqrt(var)
    scale = jnp.where(scale < _SCALE_EPS, 1.0, scale)
    return loc, scale


def instance_norm_inverse(x: jax.Array, loc: jax.Array, scale: jax.Array) -> jax.Array:
    """Undo standardization; broadcasts (B, 1) stats over trailing dims of (B, ...)."""
    extra = x.ndim - loc.ndim
    return x * scale.reshape(scale.shape + (1,) * extra) + loc.reshape(loc.shape + (1,) * extra)


# ---------------------------------------------------------------------------
# T5-style encoder with relative position bias
# ---------------------------------------------------------------------------


def _relative_bucket(rel: jax.Array, num_buckets: int, max_distance: int) -> jax.Array:
    """T5 bidirectional relative-position bucketing."""
    num = num_buckets // 2
    ret = jnp.where(rel > 0, num, 0)
    rel = jnp.abs(rel)
    max_exact = num // 2
    is_small = rel < max_exact
    log_ratio = jnp.log(jnp.maximum(rel, 1).astype(jnp.float32) / max_exact) / jnp.log(
        max_distance / max_exact
    )
    large = max_exact + (log_ratio * (num - max_exact)).astype(jnp.int32)
    large = jnp.minimum(large, num - 1)
    return ret + jnp.where(is_small, rel, large)


def init_chronos_encoder(rng: jax.Array, cfg: Chronos2Config) -> Params:
    keys = jax.random.split(rng, cfg.num_layers + 2)
    layers = []
    for i in range(cfg.num_layers):
        k1, k2, k3 = jax.random.split(keys[i], 3)
        layers.append(
            {
                "attn_norm": L.init_rms_norm(cfg.model_dim),
                "attn": {
                    "q": L.init_dense(k1, cfg.model_dim, cfg.model_dim, bias=False),
                    "k": L.init_dense(jax.random.fold_in(k1, 1), cfg.model_dim, cfg.model_dim, bias=False),
                    "v": L.init_dense(jax.random.fold_in(k1, 2), cfg.model_dim, cfg.model_dim, bias=False),
                    "out": L.init_dense(jax.random.fold_in(k1, 3), cfg.model_dim, cfg.model_dim, bias=False),
                },
                "ffn_norm": L.init_rms_norm(cfg.model_dim),
                "ffn_up": L.init_dense(k2, cfg.model_dim, cfg.ffn_dim, bias=False),
                "ffn_down": L.init_dense(k3, cfg.ffn_dim, cfg.model_dim, bias=False),
            }
        )
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *layers)
    return {
        "layers": stacked,
        "rel_pos_bias": L.xavier_uniform(keys[-2], (cfg.rel_pos_buckets, cfg.num_heads)),
        "final_norm": L.init_rms_norm(cfg.model_dim),
    }


def chronos_encoder(
    params: Params,
    cfg: Chronos2Config,
    x: jax.Array,
    attention_mask: jax.Array,
    segment_ids: jax.Array | None = None,
) -> jax.Array:
    """Bidirectional T5-style encoder.

    Args:
        attention_mask: (B, S), 1.0 = valid.
        segment_ids: optional (B, S) int — group attention for packed
            sequences: tokens attend only within their segment (the
            mechanism behind Chronos-2's ``group_ids`` multivariate packing;
            the reference adapter path packs one series per row, i.e. one
            segment).
    """
    batch, seq, _ = x.shape

    # Fused row-tile Pallas path (opt-in via MTT_CHRONOS_ROWTILE=1,
    # ops/chronos_attention.py): the whole encoder runs at S padded to a
    # sublane multiple, each layer's q/k/v kernels concatenate into ONE fused
    # GEMM whose raw (B, S, 3*H*D) output the kernel consumes directly, and
    # the backward recomputes the weights (no logits/probs residuals through
    # the layer scan) while accumulating the trainable rel-pos bias's
    # cotangent in-kernel. Segment masking covers both per-row bidirectional
    # attention and the ``pack``ed group_ids mechanism. It superseded
    # round-4's whole-sequence bidir kernel (−24% end-to-end, removed in r5)
    # but itself measured −11.5%/−5.7% on the two Chronos bench workloads
    # (docs/PERF.md r5 levers) — the default is the XLA path below.
    from multimodal_timesfm_tpu.ops.chronos_attention import (
        fused_chronos_attention,
        make_rowtile_bias,
        supports_chronos_rowtile,
    )

    pad = (-seq) % 8
    sp = seq + pad
    rowtile = supports_chronos_rowtile(sp, cfg.num_heads, cfg.head_dim)

    pos = jnp.arange(sp if rowtile else seq)
    rel = pos[None, :] - pos[:, None]  # key - query
    buckets = _relative_bucket(rel, cfg.rel_pos_buckets, cfg.rel_pos_max_distance)
    bias_hss = jnp.transpose(params["rel_pos_bias"][buckets], (2, 0, 1)).astype(
        jnp.float32
    )  # (H, S, S)

    if rowtile:
        # Attention-group ids: unique per (row, segment) for valid tokens —
        # segment ids are < sp + 1, so the row offset keeps rows disjoint —
        # and a unique negative id per padded/invalid token (it attends only
        # itself: finite garbage, masked as a key everywhere else and sliced
        # off below). Padded positions beyond ``seq`` are invalid by
        # construction.
        valid = jnp.pad(attention_mask > 0, ((0, 0), (0, pad)))
        base = (
            segment_ids
            if segment_ids is not None
            else jnp.zeros((batch, seq), jnp.int32)
        )
        base = jnp.pad(base, ((0, 0), (0, pad)))
        row = jnp.arange(batch, dtype=jnp.int32)[:, None]
        tok = row * sp + jnp.arange(sp, dtype=jnp.int32)[None, :]
        seg = jnp.where(valid, base + row * (sp + 1), -1 - tok)
        bias_bd = make_rowtile_bias(bias_hss, batch, sp)
        x = jnp.pad(x, ((0, 0), (0, pad), (0, 0)))
    else:
        bias = bias_hss[None]  # (1, H, S, S)
        neg = jnp.finfo(jnp.float32).min
        allowed = attention_mask[:, None, None, :] > 0  # (B, 1, 1, S)
        if segment_ids is not None:
            same = segment_ids[:, :, None] == segment_ids[:, None, :]  # (B, S, S)
            allowed = allowed & same[:, None, :, :]
        key_mask = jnp.where(allowed, 0.0, neg)

    def body(h, layer):
        normed = L.rms_norm(layer["attn_norm"], h)
        b, s, _ = normed.shape
        # T5 convention: no 1/sqrt(d) scaling (folded into weights).
        if rowtile:
            # One fused qkv GEMM: the concat reads 3 x (D, D) kernels once
            # per layer (negligible next to the GEMM) and its VJP is three
            # slices, so baseline-mode weight grads flow unchanged.
            wqkv = jnp.concatenate(
                [
                    layer["attn"]["q"]["kernel"],
                    layer["attn"]["k"]["kernel"],
                    layer["attn"]["v"]["kernel"],
                ],
                axis=1,
            )
            qkv = jnp.dot(normed, wqkv, preferred_element_type=jnp.float32).astype(
                h.dtype
            )
            ctx = fused_chronos_attention(
                qkv, seg, bias_bd, cfg.num_heads, cfg.head_dim
            )
        else:
            q = L.dense(layer["attn"]["q"], normed).reshape(
                b, s, cfg.num_heads, cfg.head_dim
            )
            k = L.dense(layer["attn"]["k"], normed).reshape(
                b, s, cfg.num_heads, cfg.head_dim
            )
            v = L.dense(layer["attn"]["v"], normed).reshape(
                b, s, cfg.num_heads, cfg.head_dim
            )
            logits = jnp.einsum(
                "bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32
            )
            logits = logits + bias + key_mask
            # Deliberately the composed softmax, NOT ops.attention.softmax_lowp:
            # the fp32 probs residual it would remove costs ~3% of leaf time
            # here, but on this geometry (12 heads x 67 tokens) XLA pays it
            # back with worse backward layouts — the bf16-only residual forced
            # per-layer copy ops on the stacked qkv reads, measured -5%
            # end-to-end (2927 -> 2784 series/s back-to-back on v5e) while the
            # same swap gains +7% on the TimesFM XLA path (docs/PERF.md).
            weights = jax.nn.softmax(logits, axis=-1).astype(h.dtype)
            ctx = jnp.einsum(
                "bhqk,bkhd->bqhd", weights, v, preferred_element_type=jnp.float32
            )
            ctx = ctx.reshape(b, s, cfg.model_dim)
        h = h + L.dense(layer["attn"]["out"], ctx.astype(h.dtype))

        normed = L.rms_norm(layer["ffn_norm"], h)
        # L.relu recomputes the pred mask from its saved output in backward,
        # dropping the bool[L, B, S, F] residual stack (layers.py).
        h = h + L.dense(layer["ffn_down"], L.relu(L.dense(layer["ffn_up"], normed)))
        return h, None

    if cfg.remat:
        body = jax.checkpoint(body)
    out, _ = jax.lax.scan(body, x.astype(cfg.compute_dtype), params["layers"])
    return L.rms_norm(params["final_norm"], out)[:, :seq]


# ---------------------------------------------------------------------------
# full model
# ---------------------------------------------------------------------------


def init_chronos(rng: jax.Array, cfg: Chronos2Config) -> Params:
    k_in, k_enc, k_out, k_shared = jax.random.split(rng, 4)
    return {
        "input_patch_embedding": L.init_residual_block(
            k_in, 3 * cfg.input_patch_size, cfg.ffn_dim, cfg.model_dim
        ),
        "shared": L.xavier_uniform(k_shared, (cfg.vocab_size, cfg.model_dim)),
        "encoder": init_chronos_encoder(k_enc, cfg),
        "output_patch_embedding": L.init_residual_block(
            k_out, cfg.model_dim, cfg.ffn_dim, cfg.num_quantiles * cfg.output_patch_size
        ),
    }


class Chronos2Adapter(TsfmAdapter):
    """Adapter exposing the Chronos-2 backbone through the TsfmAdapter contract.

    Parity surface: reference ``Chronos2Adapter``
    (``/root/reference/src/tsfmx/tsfm/chronos.py:16-207``).
    """

    def __init__(self, config: Chronos2Config | None = None) -> None:
        self.config = config or Chronos2Config()

    @staticmethod
    def config_from_hf(hf_config: dict) -> Chronos2Config:
        from multimodal_timesfm_tpu.models.snapshot import chronos2_config_from_hf

        return chronos2_config_from_hf(hf_config)

    @property
    def model_dims(self) -> int:
        return self.config.model_dim

    @property
    def patch_len(self) -> int:
        return self.config.input_patch_size

    @property
    def point_forecast_index(self) -> int:
        return self.config.quantiles.index(0.5)

    @property
    def quantile_loss_spec(self) -> tuple[tuple[float, ...], int | None]:
        """Every output channel is a quantile; no separate mean channel."""
        return self.config.quantiles, None

    def init(self, rng: jax.Array) -> Params:
        return init_chronos(rng, self.config)

    # -- pipeline --

    def preprocess(self, params: Params, inputs: jax.Array, masks: jax.Array) -> PreprocessResult:
        """Normalize, patch, time-encode, and embed (reference ``chronos.py:35-60``).

        ``masks``: bool (B, C), True = padded (project convention); flipped to
        the Chronos 1.0=valid convention internally.
        """
        from multimodal_timesfm_tpu.ops.patching import patchify

        cfg = self.config
        if masks.shape != inputs.shape:
            raise ValueError(f"masks shape {masks.shape} must match inputs shape {inputs.shape}")
        batch, context = inputs.shape
        p = cfg.input_patch_size

        valid = (~masks).astype(inputs.dtype)  # 1.0 = valid
        loc, scale = instance_norm_stats(inputs, valid)
        normed = (inputs - loc) / scale
        normed = normed * valid  # zero padded positions

        # Context time encodings end just before the forecast origin at 0.
        time_enc = (jnp.arange(-context, 0, dtype=jnp.float32) / cfg.time_encoding_scale)[None]
        time_enc = jnp.broadcast_to(time_enc, (batch, context))

        def patch(x):
            return patchify(x, p)

        features = jnp.concatenate(
            [patch(time_enc), patch(normed), patch(valid)], axis=-1
        ).astype(cfg.compute_dtype)
        input_embeds = L.residual_block(
            params["input_patch_embedding"], features, act=L.relu
        )

        # Per-patch attention mask: a patch is valid iff any point in it is valid.
        patch_valid = jnp.max(patch(valid), axis=-1)

        return PreprocessResult(
            input_embeddings=input_embeds,
            masks=patch_valid == 0,  # back to project convention: True = padded
            normalization_stats={"loc": loc, "scale": scale},
        )

    def forward(
        self,
        params: Params,
        input_embeddings: jax.Array,
        masks: jax.Array,
        *,
        pack: int | None = None,
    ) -> jax.Array:
        """Append [REG] + zero future patches, run the encoder (reference ``chronos.py:62-126``).

        ``masks`` here is the per-patch bool mask from preprocess (True = padded).

        ``pack`` exposes the encoder's ``group_ids`` attention-grouping: with
        ``pack=k``, groups of ``k`` consecutive batch rows are packed into one
        encoder row as ``k`` segments (each segment the full per-series
        ``[ctx, REG, future]`` sequence) and tokens attend only within their
        segment. The default ``pack=1`` is exactly the reference adapter's
        ``group_ids=arange(B)`` contract (``chronos.py:117-123``): every
        series its own attention group. Because the T5 relative-position bias
        depends only on position differences and each segment occupies
        contiguous positions, packed attention is numerically identical to
        per-row attention (tested in ``tests/test_chronos.py``) — packing
        just trades batch dim for sequence dim, which on TPU turns many short
        attention problems into fewer MXU-friendlier ones.
        """
        cfg = self.config
        if pack is None:
            pack = cfg.pack
        if pack < 1:
            raise ValueError(f"pack must be >= 1, got {pack}")
        batch = input_embeddings.shape[0]
        dtype = input_embeddings.dtype
        n_out = cfg.max_output_patches
        out_p = cfg.output_patch_size

        final_future_len = n_out * out_p
        future_time_enc = (
            jnp.arange(0, final_future_len, dtype=jnp.float32) / cfg.time_encoding_scale
        ).reshape(1, n_out, out_p).astype(dtype)
        zeros = jnp.zeros((1, n_out, out_p), dtype)
        future_features = jnp.concatenate([future_time_enc, zeros, zeros], axis=-1)
        # The future rows are identical across the batch: embed ONCE at
        # batch 1 and broadcast. Gradient-identical (broadcast's backward
        # sums over batch) and removes a batch-factor of duplicate MLP FLOPs
        # from the training hot path (B x mop rows -> mop rows).
        future_embeds = jnp.broadcast_to(
            L.residual_block(params["input_patch_embedding"], future_features, act=L.relu),
            (batch, n_out, cfg.model_dim),
        )

        attention_mask = (~masks).astype(dtype)  # (B, Nc) 1.0 = valid
        future_mask = jnp.ones((batch, n_out), dtype)

        if cfg.use_reg_token:
            reg = jnp.broadcast_to(
                params["shared"][cfg.reg_token_id][None, None, :], (batch, 1, cfg.model_dim)
            ).astype(dtype)
            embeds = jnp.concatenate([input_embeddings, reg, future_embeds], axis=-2)
            attention_mask = jnp.concatenate(
                [attention_mask, jnp.ones((batch, 1), dtype), future_mask], axis=-1
            )
        else:
            embeds = jnp.concatenate([input_embeddings, future_embeds], axis=-2)
            attention_mask = jnp.concatenate([attention_mask, future_mask], axis=-1)

        if pack == 1:
            hidden = chronos_encoder(params["encoder"], cfg, embeds, attention_mask)
            return hidden[:, -n_out:]

        if batch % pack != 0:
            raise ValueError(f"batch ({batch}) must be divisible by pack ({pack})")
        groups, seq = batch // pack, embeds.shape[1]
        packed = embeds.reshape(groups, pack * seq, cfg.model_dim)
        packed_mask = attention_mask.reshape(groups, pack * seq)
        segment_ids = jnp.broadcast_to(
            jnp.repeat(jnp.arange(pack, dtype=jnp.int32), seq)[None], (groups, pack * seq)
        )
        hidden = chronos_encoder(
            params["encoder"], cfg, packed, packed_mask, segment_ids=segment_ids
        )
        hidden = hidden.reshape(groups, pack, seq, cfg.model_dim)[:, :, -n_out:, :]
        return hidden.reshape(batch, n_out, cfg.model_dim)

    def postprocess(
        self,
        params: Params,
        horizon: int,
        output_embeddings: jax.Array,
        normalization_stats: dict[str, jax.Array],
    ) -> jax.Array:
        """Quantile head + inverse instance norm + horizon slice (reference ``chronos.py:128-169``)."""
        cfg = self.config
        max_horizon = cfg.max_output_patches * cfg.output_patch_size
        if horizon > max_horizon:
            raise ValueError(
                f"horizon ({horizon}) exceeds the maximum prediction length "
                f"({max_horizon} = {cfg.max_output_patches} patches * {cfg.output_patch_size} steps)."
            )
        batch = output_embeddings.shape[0]
        q = cfg.num_quantiles

        # Only the first ceil(horizon / output_patch_size) patches survive the
        # horizon slice; the head weights are position-shared, so projecting
        # just those is column-exact and skips the head GEMMs (and their
        # zero-grad backward) for the other patches (62 of 64 at the
        # reference-default horizon 32 / mop 64).
        n_h = -(-horizon // cfg.output_patch_size)
        preds = L.residual_block(
            params["output_patch_embedding"], output_embeddings[:, :n_h], act=L.relu
        ).astype(jnp.float32)
        preds = preds.reshape(batch, n_h, q, cfg.output_patch_size)
        preds = jnp.transpose(preds, (0, 2, 1, 3)).reshape(batch, q, n_h * cfg.output_patch_size)
        preds = instance_norm_inverse(
            preds, normalization_stats["loc"], normalization_stats["scale"]
        )
        return jnp.transpose(preds[:, :, :horizon], (0, 2, 1))
