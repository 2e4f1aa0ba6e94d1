"""Model configuration for Time-MMD workloads.

Parity: reference ``examples/time_mmd/configs/model.py:13-44`` — same YAML
format, so the shipped ``models/*.yml`` files are interchangeable.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path
from typing import Literal

from multimodal_timesfm_tpu.utils.yaml import load_yaml


@dataclass
class AdapterConfig:
    """TSFM adapter selection + geometry.

    ``arch`` holds optional architecture-hyperparameter overrides forwarded
    to the backbone config (e.g. tiny geometries for tests) — an extension
    over the reference's fixed upstream geometry.
    """

    type: Literal["chronos", "timesfm"] = "timesfm"
    pretrained_repo: str = "google/timesfm-2.5-200m-pytorch"
    patch_len: int = 32
    arch: dict = field(default_factory=dict)


@dataclass
class FusionConfig:
    """Fusion head + text encoder selection."""

    text_encoder_type: Literal["english", "japanese"] = "english"
    text_embedding_dims: int = 384
    num_fusion_layers: int = 1
    fusion_hidden_dims: list[int] = field(default_factory=list)


@dataclass
class ModelConfig:
    adapter: AdapterConfig = field(default_factory=AdapterConfig)
    fusion: FusionConfig = field(default_factory=FusionConfig)

    @classmethod
    def from_yaml(cls, path: Path | str) -> ModelConfig:
        config_dict = load_yaml(path)
        return cls(
            adapter=AdapterConfig(**config_dict.get("adapter", {})),
            fusion=FusionConfig(**config_dict.get("fusion", {})),
        )
