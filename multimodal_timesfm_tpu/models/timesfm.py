"""TimesFM 2.5 backbone in JAX, and its adapter.

Re-derivation of the upstream ``TimesFM_2p5_200M_torch_module`` pieces the
reference adapter reaches into (SURVEY.md §2.5; reference
``/root/reference/src/tsfmx/tsfm/timesfm.py:36-158``):

  * ``tokenizer``        — residual MLP fed ``[normed_patch, mask]`` (width 2p)
  * ``stacked_xf``       — stack of causal transformer blocks
  * ``output_projection_point`` — hidden -> output_patch_len * num_channels
  * ``revin`` / ``update_running_stats`` — masked per-patch running stats

200M geometry: input_patch_len p=32, output_patch_len o=128, model_dims
md=1280, ffn=1280, 20 layers, 16 heads x 80 head_dim, q=10 output channels
(point + 9 deciles), decode_index=5 (median channel).

Wiring oracle: the block design (per-dim softplus query scaling, RMSNorm ->
attention -> residual, LayerNorm'd ReLU MLP with padding-zeroed residual,
SiLU residual blocks, mean-then-quantiles channel order) is verified
numerically against ``transformers``' TimesFM implementation on shared
weights — see ``tests/test_hf_timesfm_oracle.py``.

Semantics parity notes vs the reference adapter:
  * preprocess patches the context, computes causal masked running mean/std
    per patch (closed-form, see ``ops/revin.py``), RevIN-normalizes,
    zero-fills padded positions, and tokenizes ``[normed, mask]``
    (``timesfm.py:54-74``).
  * forward runs the transformer stack with the per-patch mask taken from
    the **last element** of each patch mask (``timesfm.py:95-98``).
  * postprocess projects, reverses RevIN with the same per-patch stats,
    reshapes to (B, N, o, q) and returns the **last patch** sliced to the
    horizon; horizon > o raises — no autoregressive decode
    (``timesfm.py:100-129``).

Pretrained weights: see ``models/convert.py`` for the
``model.safetensors`` -> pytree mapping (HF repo
``google/timesfm-2.5-200m-pytorch``, reference ``timesfm.py:140-158``).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from multimodal_timesfm_tpu.models import layers as L
from multimodal_timesfm_tpu.models.base import Params, PreprocessResult, TsfmAdapter
from multimodal_timesfm_tpu.ops.patching import patchify
from multimodal_timesfm_tpu.ops.revin import masked_running_stats, revin


@dataclasses.dataclass(frozen=True)
class TimesFMConfig:
    """Architecture hyperparameters. Defaults = the 200M checkpoint geometry."""

    input_patch_len: int = 32
    output_patch_len: int = 128
    model_dims: int = 1280
    ffn_dims: int = 1280
    num_layers: int = 20
    num_heads: int = 16
    num_output_channels: int = 10  # point + 9 quantiles
    decode_index: int = 5  # median channel: the point forecast
    # Level per quantile channel (channels 1..; channel 0 is the mean —
    # ordering verified against the HF TimesFM head, tests/test_hf_timesfm_oracle.py).
    quantiles: tuple[float, ...] = (0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9)
    # Continuous quantile head (upstream ``output_projection_quantiles``):
    # full-horizon quantile forecasts from the last hidden state. Unused by
    # the reference adapter pipeline; config-gated for checkpoint-format
    # completeness and quantile forecasting.
    use_quantile_head: bool = False
    quantile_horizon: int = 1024
    compute_dtype: Any = jnp.float32
    # lax.scan unroll over the layer stack: >1 lets XLA fuse across layer
    # boundaries at higher compile cost (compile time scales with unroll).
    scan_unroll: int = 1
    # Rematerialize the layer stack in backward (jax.checkpoint): trades
    # ~1/3 more FLOPs for the per-layer residual HBM traffic/memory.
    remat: bool = False

    @property
    def head_dim(self) -> int:
        return self.model_dims // self.num_heads

    @classmethod
    def tiny(cls) -> "TimesFMConfig":
        """A CPU-testable miniature with the same wiring."""
        return cls(
            input_patch_len=4,
            output_patch_len=8,
            model_dims=32,
            ffn_dims=32,
            num_layers=2,
            num_heads=2,
        )


def init_timesfm(rng: jax.Array, cfg: TimesFMConfig) -> Params:
    """Random-init the full backbone pytree."""
    k_tok, k_stack, k_out, k_q = jax.random.split(rng, 4)
    params = {
        "tokenizer": L.init_residual_block(
            k_tok, 2 * cfg.input_patch_len, cfg.model_dims, cfg.model_dims
        ),
        "stacked_xf": L.init_stacked_layers(
            k_stack, cfg.num_layers, cfg.model_dims, cfg.num_heads, cfg.head_dim, cfg.ffn_dims
        ),
        "output_projection_point": L.init_residual_block(
            k_out,
            cfg.model_dims,
            cfg.model_dims,
            cfg.output_patch_len * cfg.num_output_channels,
        ),
    }
    if cfg.use_quantile_head:
        params["output_projection_quantiles"] = L.init_residual_block(
            k_q,
            cfg.model_dims,
            cfg.model_dims,
            cfg.quantile_horizon * cfg.num_output_channels,
        )
    return params


class TimesFM2p5Adapter(TsfmAdapter):
    """Adapter exposing the TimesFM backbone through the TsfmAdapter contract.

    Parity surface: reference ``TimesFM2p5Adapter``
    (``/root/reference/src/tsfmx/tsfm/timesfm.py:17-166``).
    """

    def __init__(self, config: TimesFMConfig | None = None) -> None:
        self.config = config or TimesFMConfig()

    @staticmethod
    def config_from_hf(hf_config: dict) -> TimesFMConfig:
        from multimodal_timesfm_tpu.models.snapshot import timesfm_config_from_hf

        return timesfm_config_from_hf(hf_config)

    @property
    def model_dims(self) -> int:
        return self.config.model_dims

    @property
    def patch_len(self) -> int:
        return self.config.input_patch_len

    @property
    def point_forecast_index(self) -> int:
        return self.config.decode_index

    @property
    def quantile_loss_spec(self) -> tuple[tuple[float, ...], int | None]:
        """Mean at channel 0, quantile levels on channels 1.. (HF-verified order)."""
        if 1 + len(self.config.quantiles) != self.config.num_output_channels:
            raise ValueError(
                f"num_output_channels ({self.config.num_output_channels}) must be "
                f"1 + len(quantiles) ({len(self.config.quantiles)}) for quantile loss"
            )
        return self.config.quantiles, 0

    def init(self, rng: jax.Array) -> Params:
        return init_timesfm(rng, self.config)

    def preprocess(self, params: Params, inputs: jax.Array, masks: jax.Array) -> PreprocessResult:
        """Patch, RevIN-normalize with causal running stats, and tokenize.

        Args:
            inputs: (B, C) float series; C must be a multiple of patch_len.
            masks: (B, C) bool, True = padded.
        """
        cfg = self.config
        if masks.shape != inputs.shape:
            raise ValueError(f"masks shape {masks.shape} must match inputs shape {inputs.shape}")

        patched_inputs = patchify(inputs, cfg.input_patch_len)
        patched_masks = patchify(masks, cfg.input_patch_len)

        context_mu, context_sigma = masked_running_stats(patched_inputs, patched_masks)

        normed = revin(patched_inputs, context_mu, context_sigma, reverse=False)
        normed = jnp.where(patched_masks, 0.0, normed)

        tokenizer_inputs = jnp.concatenate(
            [normed, patched_masks.astype(normed.dtype)], axis=-1
        ).astype(cfg.compute_dtype)
        input_embeddings = L.residual_block(params["tokenizer"], tokenizer_inputs)

        return PreprocessResult(
            input_embeddings=input_embeddings,
            masks=patched_masks,
            normalization_stats={"context_mu": context_mu, "context_sigma": context_sigma},
        )

    def forward(self, params: Params, input_embeddings: jax.Array, masks: jax.Array) -> jax.Array:
        """Run the transformer stack; per-patch mask = last element of each patch mask."""
        cfg = self.config
        per_patch_mask = masks[..., -1]
        return L.stacked_transformer(
            params["stacked_xf"],
            input_embeddings.astype(cfg.compute_dtype),
            per_patch_mask,
            cfg.num_heads,
            cfg.head_dim,
            unroll=cfg.scan_unroll,
            remat=cfg.remat,
        )

    def postprocess(
        self,
        params: Params,
        horizon: int,
        output_embeddings: jax.Array,
        normalization_stats: dict[str, jax.Array],
    ) -> jax.Array:
        """Project to (o, q) channels, reverse RevIN, take the last patch sliced to horizon.

        Raises:
            ValueError: if horizon > output_patch_len (no AR decode, matching
                the reference guard at ``timesfm.py:116-119``).
        """
        cfg = self.config
        if horizon > cfg.output_patch_len:
            raise ValueError(
                f"horizon must be <= output_patch_len ({cfg.output_patch_len}), got {horizon}. "
                "The single-shot forward matches the reference's no-AR guard; for longer "
                "horizons use inference.Forecaster.forecast_autoregressive (or "
                "scripts/forecast.py --autoregressive)."
            )
        batch = output_embeddings.shape[0]
        # Only the LAST patch's forecast is ever returned (reference
        # ``timesfm.py:129``), so project only it — column-exact, and saves
        # the head GEMMs + RevIN over the other N-1 patches.
        output_ts = L.residual_block(
            params["output_projection_point"], output_embeddings[:, -1:]
        )
        output_ts = output_ts.astype(jnp.float32)
        renormed = revin(
            output_ts,
            normalization_stats["context_mu"][:, -1:],
            normalization_stats["context_sigma"][:, -1:],
            reverse=True,
        ).reshape(batch, cfg.output_patch_len, cfg.num_output_channels)
        return renormed[:, :horizon, :]

    def postprocess_quantiles(
        self,
        params: Params,
        horizon: int,
        output_embeddings: jax.Array,
        normalization_stats: dict[str, jax.Array],
    ) -> jax.Array:
        """Full-horizon quantile forecasts via the continuous quantile head.

        Extension over the reference adapter surface (which only exposes the
        point projection): uses the upstream ``output_projection_quantiles``
        head, supporting horizons up to ``quantile_horizon``. Requires
        ``use_quantile_head=True``.
        """
        cfg = self.config
        if not cfg.use_quantile_head:
            raise ValueError("configure use_quantile_head=True to use the quantile head")
        if horizon > cfg.quantile_horizon:
            raise ValueError(
                f"horizon must be <= quantile_horizon ({cfg.quantile_horizon}), got {horizon}."
            )
        batch = output_embeddings.shape[0]
        output_ts = L.residual_block(
            params["output_projection_quantiles"], output_embeddings[:, -1:]
        )
        output_ts = output_ts.astype(jnp.float32)
        renormed = revin(
            output_ts,
            normalization_stats["context_mu"][:, -1:],
            normalization_stats["context_sigma"][:, -1:],
            reverse=True,
        ).reshape(batch, cfg.quantile_horizon, cfg.num_output_channels)
        return renormed[:, :horizon, :]
