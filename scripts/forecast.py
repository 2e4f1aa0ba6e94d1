#!/usr/bin/env python3
"""Batch forecasting CLI: run a trained model over a cached dataset.

New serving surface (the reference has no inference CLI): loads a cached
PreprocessedSample pickle, a backbone (local checkpoint dir or random init)
and optionally a trained fusion/adapter checkpoint, and writes point (or
full-quantile) forecasts plus metadata to an ``.npz``.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_timesfm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from examples.time_mmd.configs.model import ModelConfig  # noqa: E402
from examples.time_mmd.sweep_lib import build_adapter, init_decoder_params  # noqa: E402
from multimodal_timesfm_tpu.data.preprocess import PreprocessPipeline  # noqa: E402
from multimodal_timesfm_tpu.inference import Forecaster  # noqa: E402
from multimodal_timesfm_tpu.models.decoder import (  # noqa: E402
    MultimodalDecoder,
    MultimodalDecoderConfig,
)
from multimodal_timesfm_tpu.training.checkpoint import load_checkpoint  # noqa: E402
from multimodal_timesfm_tpu.utils.logging import setup_logger  # noqa: E402

_logger = setup_logger()


def main() -> int:
    parser = argparse.ArgumentParser(description="Batch forecasting over a cached dataset.")
    parser.add_argument("--cache-file", type=str, required=True, help="PreprocessedSample pickle.")
    parser.add_argument("--model-config", type=str)
    parser.add_argument("--horizon", type=int, required=True)
    parser.add_argument("--pretrained-dir", type=str, help="Local backbone checkpoint dir.")
    parser.add_argument("--checkpoint", type=str, help="Trained .ckpt (fusion or adapter).")
    parser.add_argument("--multimodal", action="store_true", help="Feed text embeddings.")
    parser.add_argument("--full", action="store_true", help="All quantile channels.")
    parser.add_argument(
        "--autoregressive",
        action="store_true",
        help="Decode horizons beyond the backbone's single-shot cap by sliding "
        "the context window (one fused device dispatch; point forecasts only).",
    )
    parser.add_argument(
        "--text-mode",
        choices=("first_window", "error"),
        default="first_window",
        help="Multi-window AR with text: fuse the first window only (default, "
        "warns once) or refuse ('error').",
    )
    parser.add_argument("--denormalize", action="store_true")
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--output", type=str, default="forecasts.npz")
    args = parser.parse_args()

    model_config = ModelConfig.from_yaml(args.model_config) if args.model_config else ModelConfig()
    adapter = build_adapter(model_config, args.pretrained_dir)
    decoder = MultimodalDecoder(
        adapter,
        MultimodalDecoderConfig(text_embedding_dims=model_config.fusion.text_embedding_dims),
    )
    params = init_decoder_params(decoder, args.pretrained_dir, seed=0)

    if args.checkpoint:
        ckpt = load_checkpoint(Path(args.checkpoint))
        if "fusion_params" in ckpt:
            params["fusion"] = ckpt["fusion_params"]
            _logger.info("Loaded fusion params from %s", args.checkpoint)
        if "adapter_params" in ckpt:
            params["adapter"] = ckpt["adapter_params"]
            _logger.info("Loaded adapter params from %s", args.checkpoint)

    samples = PreprocessPipeline(Path(args.cache_file).parent).load(Path(args.cache_file))
    forecaster = Forecaster(decoder, params, batch_size=args.batch_size)
    preds = forecaster.forecast_dataset(
        args.horizon,
        samples,
        multimodal=args.multimodal,
        denormalize=args.denormalize,
        full=args.full,
        autoregressive=args.autoregressive,
        text_mode=args.text_mode,
    )

    metadata = [s["metadata"] for s in samples]
    np.savez(
        args.output,
        forecasts=preds,
        metadata=np.asarray([json.dumps(m, default=str) for m in metadata]),
    )
    _logger.info("Wrote %s forecasts of shape %s to %s", len(preds), preds.shape, args.output)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
