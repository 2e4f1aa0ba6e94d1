"""Multimodal decoder: the composition root of the forecasting pipeline.

Parity: reference ``MultimodalDecoder``
(``/root/reference/src/tsfmx/decoder.py:12-92``). Pipeline:
``adapter.preprocess -> fusion (iff text_embeddings given) -> adapter.forward
-> adapter.postprocess``. Params are a two-subtree pytree
``{"adapter": ..., "fusion": ...}`` — the training mode decides which subtree
the optimizer touches.
"""

from __future__ import annotations

import dataclasses

import jax

from multimodal_timesfm_tpu.models.base import Params, TsfmAdapter
from multimodal_timesfm_tpu.models.fusion import FusionSpec, apply_fusion, init_fusion


@dataclasses.dataclass(frozen=True)
class MultimodalDecoderConfig:
    """Parity: reference ``MultimodalDecoderConfig`` (``decoder.py:12-18``)."""

    text_embedding_dims: int = 384
    num_fusion_layers: int = 1
    fusion_hidden_dims: tuple[int, ...] = ()


class MultimodalDecoder:
    """Stateless decoder over an adapter + fusion head."""

    def __init__(self, adapter: TsfmAdapter, config: MultimodalDecoderConfig | None = None) -> None:
        self.adapter = adapter
        self.config = config or MultimodalDecoderConfig()
        self.fusion_spec = FusionSpec(
            ts_embedding_dims=adapter.model_dims,
            text_embedding_dims=self.config.text_embedding_dims,
            num_layers=self.config.num_fusion_layers,
            hidden_dims=tuple(self.config.fusion_hidden_dims),
        )

    def init(self, rng: jax.Array) -> Params:
        k_adapter, k_fusion = jax.random.split(rng)
        return {
            "adapter": self.adapter.init(k_adapter),
            "fusion": init_fusion(k_fusion, self.fusion_spec),
        }

    def _encode(self, params: Params, inputs: jax.Array, masks: jax.Array, text_embeddings: jax.Array | None) -> tuple:
        """Shared pipeline prefix: validate -> preprocess -> fuse -> forward.

        Returns ``(output_embeddings, normalization_stats)`` for a
        postprocess head to consume (point/full vs quantile).
        """
        if masks.shape != inputs.shape:
            raise ValueError(f"masks shape {masks.shape} must match inputs shape {inputs.shape}")
        masks = masks.astype(bool)
        pre = self.adapter.preprocess(params["adapter"], inputs, masks)
        embeddings = (
            apply_fusion(params["fusion"], pre.input_embeddings, text_embeddings)
            if text_embeddings is not None
            else pre.input_embeddings
        )
        output_embeddings = self.adapter.forward(params["adapter"], embeddings, pre.masks)
        return output_embeddings, pre.normalization_stats

    def forward_full(
        self,
        params: Params,
        horizon: int,
        inputs: jax.Array,
        masks: jax.Array,
        text_embeddings: jax.Array | None = None,
    ) -> jax.Array:
        """Run the pipeline, returning all output channels (B, horizon, num_outputs).

        Parity: reference ``decoder.py:38-72`` — fusion applies only when
        text embeddings are provided; masks must match the input shape.
        """
        output_embeddings, stats = self._encode(params, inputs, masks, text_embeddings)
        return self.adapter.postprocess(params["adapter"], horizon, output_embeddings, stats)

    def forward_quantiles(
        self,
        params: Params,
        horizon: int,
        inputs: jax.Array,
        masks: jax.Array,
        text_embeddings: jax.Array | None = None,
    ) -> jax.Array:
        """Long-horizon quantile forecasts via the adapter's quantile head.

        Extension over the reference surface: requires an adapter exposing
        ``postprocess_quantiles`` (TimesFM with ``use_quantile_head=True``).
        Returns (B, horizon, num_output_channels) for horizons up to the
        quantile head's range.
        """
        postprocess_quantiles = getattr(self.adapter, "postprocess_quantiles", None)
        if postprocess_quantiles is None:
            raise NotImplementedError(
                f"{type(self.adapter).__name__} has no quantile head; use forward_full"
            )
        output_embeddings, stats = self._encode(params, inputs, masks, text_embeddings)
        return postprocess_quantiles(params["adapter"], horizon, output_embeddings, stats)

    def __call__(
        self,
        params: Params,
        horizon: int,
        inputs: jax.Array,
        masks: jax.Array,
        text_embeddings: jax.Array | None = None,
    ) -> jax.Array:
        """Point forecast (B, horizon) — the ``point_forecast_index`` channel.

        Parity: reference ``decoder.py:74-92``.
        """
        full = self.forward_full(params, horizon, inputs, masks, text_embeddings)
        return full[..., self.adapter.point_forecast_index]
