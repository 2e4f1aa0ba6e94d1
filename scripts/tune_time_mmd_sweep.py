#!/usr/bin/env python3
"""Hyperparameter tuning for multimodal forecasting (W&B Sweeps or local random search).

CLI parity with the reference (``/root/reference/scripts/tune_time_mmd_sweep.py``):
``--sweep-id``/``--sweep-config``/``--count``/``--model-config``/
``--forecast-config``/``--augment``/``--cache-dir``/``--seed``. When W&B is
installed and reachable it drives a Bayes sweep exactly like the reference;
otherwise (or with ``--offline``) the same sweep YAML parameter space is
random-searched locally with results logged to JSONL.
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
from examples.time_mmd.sweep_lib import train_and_evaluate  # noqa: E402
from multimodal_timesfm_tpu.training_args import TrainingArguments  # noqa: E402
from multimodal_timesfm_tpu.utils.logging import setup_logger  # noqa: E402
from multimodal_timesfm_tpu.utils.seed import set_seed  # noqa: E402
from multimodal_timesfm_tpu.utils.tracking import LocalSweep, try_import_wandb  # noqa: E402
from multimodal_timesfm_tpu.utils.yaml import load_yaml  # noqa: E402

_logger = setup_logger()

MODE = "multimodal"


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Run a hyperparameter sweep for multimodal time series forecasting."
    )
    parser.add_argument("--sweep-id", type=str, help="Existing W&B sweep ID to join.")
    parser.add_argument("--sweep-config", type=str, help="Path to a sweep YAML config file.")
    parser.add_argument("--count", type=int, help="Number of sweep runs to execute.")
    parser.add_argument("--model-config", type=str)
    parser.add_argument("--forecast-config", type=str)
    parser.add_argument(
        "--augment", nargs="*", choices=["train", "val", "test"], default=["train"]
    )
    parser.add_argument("--cache-dir", type=str, default="data/cache")
    parser.add_argument("--pretrained-dir", type=str, help="Local backbone checkpoint dir.")
    parser.add_argument("--offline", action="store_true", help="Force the local sweep engine.")
    parser.add_argument("--output-dir", type=str, default=None)
    parser.add_argument("--seed", type=int)
    parser.add_argument(
        "--loss-type",
        choices=["mse", "quantile"],
        default="mse",
        help="Training objective: mse (reference parity) or quantile "
        "(mean-MSE + pinball over the adapter's quantile channels).",
    )
    parser.add_argument(
        "--require-pretrained-text",
        action="store_true",
        help="Refuse embedding caches built without pretrained text-encoder "
        "weights (parity-grade evals should set this; see docs/PRETRAINED.md).",
    )
    parser.add_argument(
        "--vectorized",
        action="store_true",
        help="Train sweep trials SIMULTANEOUSLY on-device (grouped by "
        "structural hyperparameters, vmapped over lr/weight-decay/warmup). "
        "Offline engine + multimodal mode only; results land in the same "
        "sweep_results.jsonl.",
    )
    return parser.parse_args()


def main(mode: str = MODE) -> int:
    args = parse_args()

    model_config = ModelConfig.from_yaml(args.model_config) if args.model_config else ModelConfig()
    forecast_config = (
        ForecastConfig.from_yaml(args.forecast_config) if args.forecast_config else ForecastConfig()
    )
    output_dir = args.output_dir or f"outputs/sweeps/{mode}"
    base_training_args = TrainingArguments(
        output_dir=output_dir,
        logging_strategy="epoch",
        eval_strategy="epoch",
        save_strategy="best",
        load_best_model_at_end=False,
        loss_type=args.loss_type,
        seed=args.seed,
    )
    if args.seed is not None:
        set_seed(args.seed)

    augment_splits = set(args.augment)

    import jax

    mesh = None
    if len(jax.devices()) > 1:
        from multimodal_timesfm_tpu.parallel.mesh import make_mesh

        mesh = make_mesh()

    def run_trial(run) -> None:
        train_and_evaluate(
            run=run,
            base_training_args=base_training_args,
            model_config=model_config,
            forecast_config=forecast_config,
            mode=mode,
            cache_dir=Path(args.cache_dir),
            augment_splits=augment_splits,
            pretrained_dir=args.pretrained_dir,
            mesh=mesh,
            require_pretrained_text=args.require_pretrained_text,
        )

    if args.vectorized:
        # Baseline mode vectorizes too when the trial count fits the device
        # budget (each baseline trial carries 5 fp32 copies of the backbone;
        # sweep_lib raises with the computed budget when it doesn't fit).
        if getattr(args, "sweep_id", None):
            _logger.error(
                "--vectorized runs a LOCAL sweep engine and cannot contribute "
                "trials to W&B sweep %s — drop --sweep-id or --vectorized.",
                args.sweep_id,
            )
            return 1
        if not args.sweep_config:
            _logger.error("--sweep-config is required for --vectorized.")
            return 1
        from examples.time_mmd.sweep_lib import train_and_evaluate_many
        from multimodal_timesfm_tpu.utils.platform import enable_compile_cache
        from multimodal_timesfm_tpu.utils.tracking import LocalRun

        enable_compile_cache()
        sweep = LocalSweep(load_yaml(args.sweep_config), Path(output_dir), seed=args.seed or 0)
        results_path = Path(output_dir) / "sweep_results.jsonl"
        offset = sweep.next_trial_index()  # relaunches continue numbering
        runs = [
            LocalRun(f"local-{offset + t}", sweep.sample(), results_path)
            for t in range(1 if args.count is None else args.count)
        ]
        for run in runs:
            # Claim run_ids on disk before training: a killed vectorized group
            # otherwise leaves no record and a relaunch would reuse the ids
            # (and replay the resume-RNG's identical configs).
            run.log({"event": "trial_start", "config": dict(run.config.items())})
        _logger.info("Vectorized sweep: %d trial(s)", len(runs))
        train_and_evaluate_many(
            runs=runs,
            base_training_args=base_training_args,
            model_config=model_config,
            forecast_config=forecast_config,
            cache_dir=Path(args.cache_dir),
            augment_splits=augment_splits,
            pretrained_dir=args.pretrained_dir,
            require_pretrained_text=args.require_pretrained_text,
            mesh=mesh,
            mode=mode,
        )
        # Feed completed trials back to the Bayes engine's durable state —
        # batched sampling gets no within-batch feedback (inherent), but a
        # relaunch in the same output dir resumes with these observations.
        metric_name = sweep.metric.get("name")
        if metric_name is not None:
            for run in runs:
                if metric_name in run.summary:
                    sweep.observe(dict(run.config.items()), float(run.summary[metric_name]))
        _logger.info("Sweep agent finished")
        return 0

    wandb = None if args.offline else try_import_wandb()
    project = f"{mode}-{model_config.adapter.type}-time-mmd"

    if wandb is not None:
        if args.sweep_id:
            sweep_id = args.sweep_id
            _logger.info("Joining existing sweep %s", sweep_id)
        else:
            if not args.sweep_config:
                _logger.error("Either --sweep-id or --sweep-config must be provided.")
                return 1
            sweep_id = wandb.sweep(sweep=load_yaml(args.sweep_config), project=project)
            _logger.info("Created new sweep %s", sweep_id)

        def _sweep_fn() -> None:
            with wandb.init(project=project) as run:
                run_trial(run)

        _logger.info("Starting W&B agent (count=%s)", args.count)
        wandb.agent(sweep_id, function=_sweep_fn, project=project, count=args.count)
    else:
        if not args.sweep_config:
            _logger.error("--sweep-config is required for the local sweep engine.")
            return 1
        _logger.info("W&B unavailable or --offline: running local random-search sweep")
        sweep = LocalSweep(
            load_yaml(args.sweep_config), Path(output_dir), seed=args.seed or 0
        )
        sweep.agent(run_trial, count=args.count)

    _logger.info("Sweep agent finished")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
