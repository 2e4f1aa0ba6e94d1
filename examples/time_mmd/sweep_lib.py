"""Shared sweep-trial logic for the tuning scripts.

Factors out the per-trial train/evaluate flow used by both
``scripts/tune_time_mmd_sweep.py`` and ``scripts/tune_baseline_sweep.py``
(reference: ``/root/reference/scripts/tune_time_mmd_sweep.py:64-266`` and
``tune_baseline_sweep.py`` share the same shape).
"""

from __future__ import annotations

import shutil
from dataclasses import replace
from pathlib import Path

import jax

from examples.time_mmd.configs.forecast import ForecastConfig
from examples.time_mmd.configs.model import ModelConfig
from examples.time_mmd.cross_validation import DomainSpec, load_fold_datasets
from multimodal_timesfm_tpu.models.base import TsfmAdapter
from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.layers import (
    fold_frozen_tree_affines,
    fold_frozen_tree_seq1,
)
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.checkpoint import load_checkpoint
from multimodal_timesfm_tpu.training.evaluator import MultimodalEvaluator
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import TrainingMode
from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()

# Fixed fold selected for high-quality textual data, matching the reference
# (``tune_time_mmd_sweep.py:304-317``).
FOLD_DOMAINS = ["Agriculture", "Economy", "Environment", "Health_US", "Traffic"]


def fold_domain_specs(augment_splits: set[str]) -> tuple[list[DomainSpec], list[DomainSpec], list[DomainSpec]]:
    """Train/val/test DomainSpecs for the fixed fold."""
    return tuple(
        [DomainSpec(name=f"{d}_{split}", augment=split in augment_splits) for d in FOLD_DOMAINS]
        for split in ("train", "val", "test")
    )


def parse_fusion_hparams(config) -> tuple[int, list[int]]:
    """Extract fusion MLP architecture from a sweep run config.

    Parity: reference ``tune_time_mmd_sweep.py:64-96`` (same keys and guards).
    """
    num_fusion_layers = config.get("num_fusion_layers", 1)
    fusion_hidden_dims: list[int] = []
    if num_fusion_layers == 1:
        pass
    elif num_fusion_layers == 2:
        dim = config.get("fusion_hidden_dim", None)
        if dim is None:
            raise ValueError("fusion_hidden_dim is required when num_fusion_layers is 2")
        fusion_hidden_dims = [dim]
    elif num_fusion_layers == 3:
        d1 = config.get("fusion_hidden_dim_1", None)
        d2 = config.get("fusion_hidden_dim_2", None)
        if d1 is None or d2 is None:
            raise ValueError(
                "fusion_hidden_dim_1 and fusion_hidden_dim_2 are required when num_fusion_layers is 3"
            )
        fusion_hidden_dims = [d1, d2]
    else:
        raise ValueError(f"num_fusion_layers must be between 1 and 3, got {num_fusion_layers}")
    return num_fusion_layers, fusion_hidden_dims


def build_adapter(model_config: ModelConfig, pretrained_dir: str | None) -> TsfmAdapter:
    """Construct the configured backbone adapter.

    ``pretrained_dir`` points at a local checkpoint directory (see
    ``models/convert.py``); without it the backbone is randomly initialized
    (logged — this environment has no network access for HF downloads).

    Geometry precedence: YAML ``arch`` overrides > the snapshot's own
    ``config.json`` (when ``pretrained_dir`` carries one) > dataclass
    defaults. The reference gets the middle tier from HF config classes
    (``/root/reference/src/tsfmx/tsfm/chronos.py:192``).
    """
    from multimodal_timesfm_tpu.models.snapshot import read_hf_config, resolve_snapshot_dir

    arch = dict(model_config.adapter.arch)
    if pretrained_dir is not None:
        pretrained_dir = str(resolve_snapshot_dir(pretrained_dir))  # accepts HF repo ids
    hf = read_hf_config(pretrained_dir) if pretrained_dir and Path(pretrained_dir).is_dir() else None
    if model_config.adapter.type == "timesfm":
        base = TimesFM2p5Adapter.config_from_hf(hf) if hf else TimesFMConfig()
        adapter: TsfmAdapter = TimesFM2p5Adapter(replace(base, **arch))
    elif model_config.adapter.type == "chronos":
        if "quantiles" in arch:
            arch["quantiles"] = tuple(arch["quantiles"])
        base_c = Chronos2Adapter.config_from_hf(hf) if hf else Chronos2Config()
        adapter = Chronos2Adapter(replace(base_c, **arch))
    else:
        raise NotImplementedError(f"Unsupported adapter type: {model_config.adapter.type!r}")
    if adapter.patch_len != model_config.adapter.patch_len:
        raise ValueError(
            f"adapter.patch_len ({adapter.patch_len}) does not match "
            f"model_config.adapter.patch_len ({model_config.adapter.patch_len}); "
            "the cached dataset was built with the config value — rebuild the cache or fix the config."
        )
    return adapter


def init_decoder_params(decoder: MultimodalDecoder, pretrained_dir: str | None, seed: int):
    """Init decoder params; load backbone weights from a local dir when given."""
    params = decoder.init(jax.random.key(seed))
    if pretrained_dir is not None:
        from multimodal_timesfm_tpu.models.convert import load_backbone_checkpoint
        from multimodal_timesfm_tpu.models.snapshot import resolve_snapshot_dir

        pretrained_dir = resolve_snapshot_dir(pretrained_dir)
        params["adapter"] = load_backbone_checkpoint(Path(pretrained_dir), decoder.adapter)
        _logger.info("Loaded pretrained backbone from %s", pretrained_dir)
    else:
        _logger.warning("No --pretrained-dir given: backbone is randomly initialized")
    return params


def override_training_args(base: TrainingArguments, config) -> TrainingArguments:
    """Apply sweep-sampled hyperparameters (reference ``tune_time_mmd_sweep.py:182-191``)."""
    return replace(
        base,
        per_device_train_batch_size=config.get("batch_size", base.per_device_train_batch_size),
        num_train_epochs=config.get("num_epochs", base.num_train_epochs),
        learning_rate=config.get("learning_rate", base.learning_rate),
        lr_scheduler_type=config.get("lr_scheduler_type", base.lr_scheduler_type),
        warmup_steps=config.get("warmup_steps", base.warmup_steps),
        weight_decay=config.get("weight_decay", base.weight_decay),
        gradient_accumulation_steps=config.get(
            "gradient_accumulation_steps", base.gradient_accumulation_steps
        ),
    )


def train_and_evaluate(
    run,
    base_training_args: TrainingArguments,
    model_config: ModelConfig,
    forecast_config: ForecastConfig,
    mode: TrainingMode,
    cache_dir: Path,
    augment_splits: set[str],
    pretrained_dir: str | None,
    mesh=None,
    require_pretrained_text: bool = False,
) -> dict:
    """One sweep trial: train, restore best, evaluate on test, log, clean up.

    Parity: reference ``_train_and_evaluate`` (``tune_time_mmd_sweep.py:148-266``).
    """
    config = run.config
    _logger.info("Starting sweep run %s with config: %s", run.id, dict(config.items()))

    num_fusion_layers, fusion_hidden_dims = parse_fusion_hparams(config)
    training_args = override_training_args(base_training_args, config)

    train_specs, val_specs, test_specs = fold_domain_specs(augment_splits)
    train_dataset, val_dataset, test_dataset = load_fold_datasets(
        train_domain_specs=train_specs,
        val_domain_specs=val_specs,
        test_domain_specs=test_specs,
        text_encoder_type=model_config.fusion.text_encoder_type,
        patch_len=model_config.adapter.patch_len,
        context_len=forecast_config.context_len,
        horizon_len=forecast_config.horizon_len,
        cache_dir=cache_dir,
        require_pretrained_embeddings=require_pretrained_text,
    )

    adapter = build_adapter(model_config, pretrained_dir)
    decoder = MultimodalDecoder(
        adapter,
        MultimodalDecoderConfig(
            text_embedding_dims=model_config.fusion.text_embedding_dims,
            num_fusion_layers=num_fusion_layers,
            fusion_hidden_dims=tuple(fusion_hidden_dims),
        ),
    )
    params = init_decoder_params(decoder, pretrained_dir, training_args.seed or 0)

    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=training_args,
        train_dataset=train_dataset,
        val_dataset=val_dataset,
        mode=mode,
        mesh=mesh,
        wandb_run=run,
    )
    trainer.train()

    best_path = training_args.checkpoint_dir / "best_model.ckpt"
    checkpoint = load_checkpoint(best_path)
    best_val_loss = checkpoint["best_val_loss"]
    trainer._load_checkpoint_state(checkpoint)

    evaluator = MultimodalEvaluator(decoder, mesh=mesh)
    test_metrics = evaluator.evaluate(
        trainer.params,
        test_dataset,
        batch_size=training_args.per_device_eval_batch_size,
        multimodal=mode == "multimodal",
        # Score the quantile heads too when they were the training objective
        # (extension; the reference never evaluates its quantile channels).
        quantile_metrics=training_args.loss_type == "quantile",
    )

    _logger.info(
        "Run %s — best_val_loss: %.6f, test_mse: %.6f, test_mae: %.6f",
        run.id,
        best_val_loss,
        test_metrics["mse"],
        test_metrics["mae"],
    )
    logged = {
        "val/best_loss": best_val_loss,
        "test/mse": test_metrics["mse"],
        "test/mae": test_metrics["mae"],
    }
    if "wql" in test_metrics:
        logged["test/wql"] = test_metrics["wql"]
        logged["test/mean_pinball"] = test_metrics["mean_pinball"]
    run.log(logged, step=trainer.global_step)

    if training_args.checkpoint_dir.exists():
        shutil.rmtree(training_args.checkpoint_dir)
    return dict(test_metrics)


def _structural_key(config, base: TrainingArguments) -> tuple:
    """Hyperparameters that change the compiled program (group key).

    Unsampled values fall back to ``base`` exactly like the sequential
    driver's ``override_training_args``.
    """
    num_layers, hidden = parse_fusion_hparams(config)
    args = override_training_args(base, config)
    return (
        num_layers,
        tuple(hidden),
        args.per_device_train_batch_size,
        args.num_train_epochs,
        args.lr_scheduler_type,
        args.gradient_accumulation_steps,
    )


def train_and_evaluate_many(
    runs: list,
    base_training_args: TrainingArguments,
    model_config: ModelConfig,
    forecast_config: ForecastConfig,
    cache_dir: Path,
    augment_splits: set[str],
    pretrained_dir: str | None,
    require_pretrained_text: bool = False,
    mesh=None,
    mode: TrainingMode = "multimodal",
) -> None:
    """Vectorized sweep: train whole groups of trials in one device dispatch.

    TPU-native extension over the reference's strictly-sequential agent loop:
    sampled configs are grouped by their *structural* hyperparameters (fusion
    architecture, batch size, epochs, schedule family, accumulation — anything
    that changes the compiled program) and each group's trials run
    SIMULTANEOUSLY via ``training/vectorized.run_vectorized_trials`` — the
    frozen backbone is shared across trials, so a group of T trials costs one
    T*B-row training run instead of T sequential B-row runs. Per-trial
    results are logged through each run's ``.log`` exactly like
    ``train_and_evaluate``.

    Baseline mode vectorizes too, budget permitting: each baseline trial
    carries fp32 copies of the whole backbone (params + AdamW moments + best
    tree + transient grads = 5x the tree), so group sizes are capped by
    ``vectorized_max_trials`` — ~3 trials/chip at the 200M TimesFM geometry
    on a 16G v5e, thousands at sweep-sized test geometries. Oversized groups
    raise with the computed budget.
    """
    import numpy as np

    from multimodal_timesfm_tpu.data.collate import stack_samples
    from multimodal_timesfm_tpu.training.vectorized import (
        device_hbm_bytes,
        evaluate_vectorized,
        replicate_trainables,
        run_vectorized_trials,
        trial_sharding,
        vectorized_max_trials,
    )

    train_specs, val_specs, test_specs = fold_domain_specs(augment_splits)
    train_dataset, val_dataset, test_dataset = load_fold_datasets(
        train_domain_specs=train_specs,
        val_domain_specs=val_specs,
        test_domain_specs=test_specs,
        text_encoder_type=model_config.fusion.text_encoder_type,
        patch_len=model_config.adapter.patch_len,
        context_len=forecast_config.context_len,
        horizon_len=forecast_config.horizon_len,
        cache_dir=cache_dir,
        require_pretrained_embeddings=require_pretrained_text,
    )

    multimodal = mode == "multimodal"
    trainable_key = "fusion" if multimodal else "adapter"

    def as_dict(dataset):
        stacked = stack_samples(dataset, multimodal=multimodal)
        out = {"context": stacked.context, "horizon": stacked.horizon}
        if multimodal:
            out["text"] = stacked.text_embeddings
        return out

    train_d, val_d, test_d = as_dict(train_dataset), as_dict(val_dataset), as_dict(test_dataset)

    # Per-trial failure isolation, like LocalSweep.agent: a config that fails
    # validation logs its error and is excluded; the rest still train.
    groups: dict[tuple, list] = {}
    failures = 0
    for run in runs:
        try:
            key = _structural_key(run.config, base_training_args)
        except Exception as e:  # noqa: BLE001 - trial isolation
            failures += 1
            _logger.warning("Trial %s failed config validation: %s", run.id, e)
            run.log({"error": f"{type(e).__name__}: {e}"})
            continue
        groups.setdefault(key, []).append(run)
    if runs and not groups:
        raise RuntimeError(f"All {failures} vectorized sweep trial(s) failed validation")

    adapter = build_adapter(model_config, pretrained_dir)
    def _run_group(key, group):
        num_layers, hidden, batch_size, num_epochs, scheduler, accum = key
        training_args = override_training_args(base_training_args, group[0].config)
        decoder = MultimodalDecoder(
            adapter,
            MultimodalDecoderConfig(
                text_embedding_dims=model_config.fusion.text_embedding_dims,
                num_fusion_layers=num_layers,
                fusion_hidden_dims=hidden,
            ),
        )
        params = init_decoder_params(decoder, pretrained_dir, training_args.seed or 0)
        frozen = {k: v for k, v in params.items() if k != trainable_key}
        if multimodal and forecast_config.context_len == model_config.adapter.patch_len:
            # One patch token end-to-end (the reference-default 32/32 sweep
            # geometry): fold each frozen layer's attention v+out projections
            # into one (D, D) matrix — exact at seq==1, same ~25% backbone-GEMM
            # saving the sequential trainer takes (models/layers.py
            # fold_frozen_tree_seq1; None for non-TimesFM trees). The fold is
            # shared across every trial in the group AND the vectorized eval,
            # which consume the same context width.
            folded = fold_frozen_tree_seq1(frozen)
            if folded is not None:
                frozen = folded
        if multimodal:
            # Fold the frozen stack's elementwise affines into the adjacent
            # GEMM weights (exact at any context; composes with the seq==1
            # fold above) — models/layers.fold_frozen_affines.
            folded = fold_frozen_tree_affines(frozen)
            if folded is not None:
                frozen = folded

        # Shard the trial axis over the mesh when the group divides evenly;
        # otherwise run the group single-device (trials stay correct either way).
        group_mesh = mesh
        if mesh is not None and len(group) % mesh.shape["data"] != 0:
            _logger.info(
                "Group of %d trials not divisible by mesh data axis (%d); running unsharded",
                len(group),
                mesh.shape["data"],
            )
            group_mesh = None

        # HBM budget: T trials x 5 fp32 copies of the trained tree (see
        # vectorized_max_trials). Only ever binding in baseline mode. The
        # budget is PER DEVICE: with the trial axis sharded over the mesh's
        # data axis each chip holds len(group)/dp trials, so an 8-chip mesh
        # fits 8x the single-device group size.
        trainable_bytes = sum(
            int(np.prod(x.shape)) * 4 for x in jax.tree.leaves(params[trainable_key])
        )
        hbm = device_hbm_bytes()
        max_t = vectorized_max_trials(trainable_bytes, hbm)
        dp = int(group_mesh.shape["data"]) if group_mesh is not None else 1
        per_device_trials = len(group) // dp
        if per_device_trials > max_t:
            raise ValueError(
                f"Vectorized {mode} group of {len(group)} trials exceeds the device "
                f"budget: each trial carries 5 fp32 copies of the {trainable_bytes / 1e6:.0f}MB "
                f"trained tree (params + AdamW mu/nu + best + grads) = "
                f"{5 * trainable_bytes / 1e9:.2f}GB/trial, and 75% of the "
                f"{hbm / 1e9:.1f}GB device memory fits {max_t} trial(s) per device "
                f"({per_device_trials} would land on each of {dp} device(s)). "
                f"Split the sweep into groups of <= {max_t * dp} (--count) or run sequentially."
            )

        # Sequential-driver parity: every trial starts from the same init and
        # batch order (the per-trial variation is purely the hyperparams).
        # Staged directly onto the mesh shards when sharded — a group sized by
        # the per-device budget times dp must never be stacked on one device.
        # The device-resident init buffer is dropped first (pop + host copy):
        # keeping the original ~trainable_bytes device array alive through the
        # group's training would erode the activation headroom the budget
        # guard just validated.
        trainable_host = jax.tree.map(np.asarray, params.pop(trainable_key))
        inits = replicate_trainables(
            trainable_host,
            len(group),
            trial_sharding(group_mesh) if group_mesh is not None else None,
        )

        num_batches = -(-len(train_dataset) // batch_size)
        total_steps = num_epochs * -(-num_batches // accum)
        # Per-trial continuous hyperparams; unsampled values fall back to the
        # BASE args (same resolution as override_training_args per trial).
        hp = {
            "learning_rate": np.asarray(
                [r.config.get("learning_rate", base_training_args.learning_rate) for r in group]
            ),
            "weight_decay": np.asarray(
                [r.config.get("weight_decay", base_training_args.weight_decay) for r in group]
            ),
            "warmup_steps": np.asarray(
                [
                    override_training_args(base_training_args, r.config).get_warmup_steps(
                        total_steps
                    )
                    for r in group
                ],
                np.float32,
            ),
        }
        _logger.info(
            "Vectorized group %s: %d trial(s) in one dispatch", key, len(group)
        )
        results = run_vectorized_trials(
            decoder,
            frozen,
            inits,
            train_d,
            val_d,
            hp,
            horizon_len=forecast_config.horizon_len,
            batch_size=batch_size,
            num_epochs=num_epochs,
            accum=accum,
            scheduler=scheduler,
            max_grad_norm=training_args.max_grad_norm,
            seed=training_args.seed or 0,
            seed_stride=0,
            eval_batch_size=training_args.per_device_eval_batch_size,
            mesh=group_mesh,
            loss_type=training_args.loss_type,
            trainable_key=trainable_key,
        )
        mse, mae = evaluate_vectorized(
            decoder,
            frozen,
            results.best_trainable,
            test_d,
            horizon_len=forecast_config.horizon_len,
            batch_size=training_args.per_device_eval_batch_size,
            trainable_key=trainable_key,
            mesh=group_mesh,
        )
        steps_per_epoch = -(-num_batches // accum)
        for t, run in enumerate(group):
            _logger.info(
                "Run %s — best_val_loss: %.6f, test_mse: %.6f, test_mae: %.6f",
                run.id,
                results.best_val[t],
                mse[t],
                mae[t],
            )
            run.log(
                {
                    "val/best_loss": float(results.best_val[t]),
                    "test/mse": float(mse[t]),
                    "test/mae": float(mae[t]),
                },
                step=num_epochs * steps_per_epoch,
            )

    # Group-level failure isolation: one failing group logs its error to all
    # of its trials; the other groups still run.
    for key, group in groups.items():
        try:
            _run_group(key, group)
        except Exception as e:  # noqa: BLE001 - trial isolation
            failures += len(group)
            _logger.warning("Vectorized group %s failed: %s", key, e)
            for run in group:
                run.log({"error": f"{type(e).__name__}: {e}"})
    if runs and failures == len(runs):
        raise RuntimeError(f"All {failures} vectorized sweep trial(s) failed")
