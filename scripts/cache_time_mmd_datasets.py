#!/usr/bin/env python3
"""Pre-compute and cache text embeddings for all Time-MMD domains.

CLI parity with the reference (``/root/reference/scripts/cache_time_mmd_datasets.py``):
for every (or selected) domain, build a TimeMmdDataset, run the chosen frozen
text encoder over each sample's per-patch texts, and pickle the
PreprocessedSample lists under the standard cache keys.

Additions vs the reference:
  * ``--text-model-dir`` points at a local HF snapshot for pretrained
    embeddings (no network access is performed; without it the encoder runs
    with random weights + a hash tokenizer, clearly logged).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_timesfm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from examples.time_mmd.configs.forecast import ForecastConfig  # noqa: E402
from examples.time_mmd.configs.model import ModelConfig  # noqa: E402
from examples.time_mmd.data.time_mmd_dataset import TimeMmdDataset  # noqa: E402
from multimodal_timesfm_tpu.data.preprocess import PreprocessPipeline  # noqa: E402
from multimodal_timesfm_tpu.text import build_text_encoder  # noqa: E402
from multimodal_timesfm_tpu.utils.logging import setup_logger  # noqa: E402
from multimodal_timesfm_tpu.utils.seed import set_seed  # noqa: E402

_logger = setup_logger()


def declared_embedding_dim(text_encoder_type: str, fusion) -> int | None:
    """Declared dim for encoder validation, only when the fusion config
    actually describes THIS encoder type.

    The fusion config's ``text_embedding_dims`` is what the fusion MLP will
    consume, so snapshot geometries should validate against it — but only if
    ``fusion.text_encoder_type`` matches the encoder being built. A japanese
    caching run with a default (english/384) model config must fall back to
    the encoder's own per-type default (768), not crash on 384 vs 768.
    """
    if fusion.text_encoder_type == text_encoder_type:
        return fusion.text_embedding_dims
    return None


def _parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Pre-compute and cache text embeddings for Time-MMD domains."
    )
    parser.add_argument("--model-config", type=str)
    parser.add_argument("--forecast-config", type=str)
    parser.add_argument(
        "--text-encoder-type", type=str, choices=["english", "japanese"], required=True
    )
    parser.add_argument("--text-model-dir", type=str, help="Local HF snapshot for the encoder.")
    parser.add_argument("--data-path", type=str, default="data/Time-MMD")
    parser.add_argument("--domains", type=str, nargs="+")
    parser.add_argument("--augment", action="store_true")
    parser.add_argument("--cache-dir", type=str, default="data/cache")
    parser.add_argument("--force-rebuild", action="store_true")
    parser.add_argument("--seed", type=int)
    return parser.parse_args()


def main() -> int:
    args = _parse_args()

    model_config = ModelConfig.from_yaml(args.model_config) if args.model_config else ModelConfig()
    forecast_config = (
        ForecastConfig.from_yaml(args.forecast_config) if args.forecast_config else ForecastConfig()
    )
    if args.seed is not None:
        set_seed(args.seed)

    text_encoder = build_text_encoder(
        args.text_encoder_type,
        args.text_model_dir,
        embedding_dim=declared_embedding_dim(args.text_encoder_type, model_config.fusion),
    )
    _logger.info(
        "Text encoder: %s (pretrained=%s)", args.text_encoder_type, text_encoder.is_pretrained
    )

    data_path = Path(args.data_path)
    domains = args.domains or TimeMmdDataset.get_domains(data_path)
    _logger.info("Caching %d domains: %s", len(domains), domains)

    pipeline = PreprocessPipeline(Path(args.cache_dir))

    for domain in domains:
        _logger.info("Processing domain: %s", domain)
        cache_path = pipeline.get_path(
            dataset_name="time_mmd",
            entity=domain,
            text_encoder_type=args.text_encoder_type,
            patch_len=model_config.adapter.patch_len,
            context_len=forecast_config.context_len,
            horizon_len=forecast_config.horizon_len,
            augment=args.augment,
        )

        def _dataset_factory(domain=domain):
            return TimeMmdDataset(
                data_dir=data_path,
                domain=domain,
                patch_len=model_config.adapter.patch_len,
                context_len=forecast_config.context_len,
                horizon_len=forecast_config.horizon_len,
                augment=args.augment,
            )

        pipeline.prepare(
            path=cache_path,
            dataset_factory=_dataset_factory,
            text_encoder=text_encoder,
            force_rebuild=args.force_rebuild,
        )
        _logger.info("Done: %s -> %s", domain, cache_path)

    _logger.info("All domains cached successfully")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
