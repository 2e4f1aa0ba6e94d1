"""Backbone-agnostic adapter contract.

Functional re-expression of the reference's ``TsfmAdapter`` ABC
(``/root/reference/src/tsfmx/tsfm/base.py:25-75``). The pipeline contract is
identical — ``preprocess -> [fusion injection point] -> forward ->
postprocess`` — but adapters here hold *no parameters*: they are stateless
strategy objects whose methods take the parameter pytree explicitly. This is
what makes mode-based freezing trivial (optimize a params subtree) and lets
one jitted train step cover both backbones.

Mask convention: **True = padded** (reference ``tsfm/base.py:16``).
"""

from __future__ import annotations

import dataclasses
from abc import ABC, abstractmethod
from typing import Any

import jax

Params = dict[str, Any]


@dataclasses.dataclass
class PreprocessResult:
    """Result of adapter preprocessing (parity: reference ``tsfm/base.py:10-22``).

    Attributes:
        input_embeddings: (B, num_patches, model_dims) tokenizer output — the
            fusion injection point.
        masks: per-patch-element bool masks, True = padded.
        normalization_stats: adapter-specific stats needed by postprocess.
    """

    input_embeddings: jax.Array
    masks: jax.Array
    normalization_stats: dict[str, jax.Array]


class TsfmAdapter(ABC):
    """Stateless adapter for a time-series foundation model backbone."""

    @property
    @abstractmethod
    def model_dims(self) -> int:
        """Hidden dimension of the backbone transformer."""

    @property
    @abstractmethod
    def patch_len(self) -> int:
        """Raw time-series steps per input patch."""

    @property
    @abstractmethod
    def point_forecast_index(self) -> int:
        """Index into the last output dim that gives the point forecast."""

    @property
    def quantile_loss_spec(self) -> tuple[tuple[float, ...], int | None]:
        """(quantile levels, index of a separate mean channel or None).

        Consumed by the trainer's ``loss_type="quantile"`` extension: pinball
        loss over the level channels plus MSE on the mean channel when one
        exists (the composite HF-TimesFM-style objective). Channels other
        than the mean are assumed to follow it in level order.
        """
        raise NotImplementedError(f"{type(self).__name__} defines no quantile loss spec")

    @abstractmethod
    def init(self, rng: jax.Array) -> Params:
        """Random-init the backbone parameter pytree."""

    @abstractmethod
    def preprocess(self, params: Params, inputs: jax.Array, masks: jax.Array) -> PreprocessResult:
        """Patch/normalize/tokenize: (B, C) series -> (B, N, D) embeddings."""

    @abstractmethod
    def forward(self, params: Params, input_embeddings: jax.Array, masks: jax.Array) -> jax.Array:
        """Run the backbone transformer stack over (possibly fused) embeddings."""

    @abstractmethod
    def postprocess(
        self,
        params: Params,
        horizon: int,
        output_embeddings: jax.Array,
        normalization_stats: dict[str, jax.Array],
    ) -> jax.Array:
        """Project to forecasts: -> (B, horizon, num_output_channels)."""

    # -- checkpoint surface (parity: reference ``load_checkpoint``/
    # ``from_pretrained``, ``tsfm/timesfm.py:131-158`` — local paths instead
    # of HF Hub downloads; see models/convert.py) --

    def load_checkpoint(self, path: Any) -> Params:
        """Load backbone params from a local checkpoint file/dir (strict)."""
        from multimodal_timesfm_tpu.models.convert import load_backbone_checkpoint

        return load_backbone_checkpoint(path, self)

    @staticmethod
    def config_from_hf(hf_config: dict) -> Any:
        """Build this adapter's config dataclass from an HF ``config.json`` dict."""
        raise NotImplementedError

    @classmethod
    def from_pretrained(cls, path_or_repo: Any, config: Any = None) -> tuple["TsfmAdapter", Params]:
        """Create the adapter and load pretrained params from a snapshot.

        ``path_or_repo`` is a local snapshot directory, a checkpoint file, or
        an HF repo id resolved against local caches (see
        ``models/snapshot.py`` — the zero-egress counterpart of the
        reference's ``from_pretrained(repo_id)`` at ``tsfm/timesfm.py:136-141``).
        When ``config`` is not given and the snapshot carries a
        ``config.json``, the backbone geometry is read from it rather than
        assumed.
        """
        from multimodal_timesfm_tpu.models.snapshot import read_hf_config, resolve_snapshot_dir

        snapshot = resolve_snapshot_dir(path_or_repo)
        if config is None and snapshot.is_dir():
            hf = read_hf_config(snapshot)
            if hf is not None:
                config = cls.config_from_hf(hf)
        adapter = cls(config) if config is not None else cls()
        return adapter, adapter.load_checkpoint(snapshot)
