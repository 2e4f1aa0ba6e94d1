#!/usr/bin/env python3
"""Export a (fine-tuned) forecaster for serving.

Formats: TF SavedModel (default) or a portable jax.export StableHLO
artifact (``--format stablehlo``) served by any JAX process via
``multimodal_timesfm_tpu.serving.load_stablehlo`` — no TF interop.

Example:
    python scripts/export_saved_model.py \
        --model-config examples/time_mmd/configs/models/timesfm.yml \
        --pretrained-dir /snapshots/timesfm-2.5-200m \
        [--fusion-checkpoint outputs/.../best_model.ckpt] \
        --context-len 32 --horizon 32 --multimodal --output exported/
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_timesfm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from examples.time_mmd.configs.model import ModelConfig  # noqa: E402
from examples.time_mmd.sweep_lib import build_adapter, init_decoder_params  # noqa: E402
from multimodal_timesfm_tpu.models.decoder import (  # noqa: E402
    MultimodalDecoder,
    MultimodalDecoderConfig,
)
from multimodal_timesfm_tpu.serving import export_saved_model, export_stablehlo  # noqa: E402
from multimodal_timesfm_tpu.utils.logging import setup_logger  # noqa: E402

_logger = setup_logger()


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--model-config", type=str, help="Model YAML (adapter + fusion).")
    parser.add_argument("--pretrained-dir", type=str, help="Backbone snapshot dir or HF repo id.")
    parser.add_argument(
        "--fusion-checkpoint",
        type=str,
        help="Trainer checkpoint (.ckpt) whose fusion_params to bake in (multimodal).",
    )
    parser.add_argument("--context-len", type=int, default=32)
    parser.add_argument("--horizon", type=int, default=32)
    parser.add_argument("--multimodal", action="store_true")
    parser.add_argument("--full-outputs", action="store_true", help="Also emit all channels.")
    parser.add_argument(
        "--format",
        choices=("savedmodel", "stablehlo"),
        default="savedmodel",
        help="savedmodel: TF SavedModel (needs tensorflow+orbax-export). "
        "stablehlo: portable jax.export artifact served by any JAX process "
        "(multimodal_timesfm_tpu.serving.load_stablehlo) with no TF interop.",
    )
    parser.add_argument("--output", type=str, required=True)
    parser.add_argument("--seed", type=int, default=0)
    return parser.parse_args()


def main() -> int:
    args = parse_args()
    model_config = ModelConfig.from_yaml(args.model_config) if args.model_config else ModelConfig()

    adapter = build_adapter(model_config, args.pretrained_dir)
    decoder = MultimodalDecoder(
        adapter,
        MultimodalDecoderConfig(text_embedding_dims=model_config.fusion.text_embedding_dims),
    )
    params = init_decoder_params(decoder, args.pretrained_dir, args.seed)

    if args.fusion_checkpoint:
        from multimodal_timesfm_tpu.training.checkpoint import load_checkpoint

        checkpoint = load_checkpoint(Path(args.fusion_checkpoint))
        # Apply EVERY trained subtree the checkpoint carries (same semantics
        # as scripts/forecast.py) — picking one would silently export stale
        # weights for the other; neither key is a usage error worth guessing
        # around.
        applied = False
        if "fusion_params" in checkpoint:
            params["fusion"] = checkpoint["fusion_params"]
            _logger.info("Loaded fusion params from %s", args.fusion_checkpoint)
            applied = True
        if "adapter_params" in checkpoint:
            params["adapter"] = checkpoint["adapter_params"]
            _logger.info("Loaded adapter params from %s", args.fusion_checkpoint)
            applied = True
        if not applied:
            _logger.error(
                "%s carries neither fusion_params nor adapter_params — is it a "
                "training checkpoint? (raw params pytrees load via --pretrained-dir)",
                args.fusion_checkpoint,
            )
            return 1

    export = export_saved_model if args.format == "savedmodel" else export_stablehlo
    export(
        decoder,
        params,
        horizon=args.horizon,
        context_len=args.context_len,
        output_dir=args.output,
        multimodal=args.multimodal,
        full_outputs=args.full_outputs,
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
