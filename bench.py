#!/usr/bin/env python3
"""Benchmark: Time-MMD-shaped multimodal fine-tune + eval throughput (series/sec).

Workload (mirrors the reference's primary configuration, SURVEY.md §6):
TimesFM 2.5 200M-geometry backbone, frozen, with a trainable 1-layer fusion
head; context 32 / horizon 32 / patch 32; 384-d cached text embeddings;
MSE point-forecast loss; AdamW + linear warmup schedule. Synthetic data with
Time-MMD statistics (z-scored contexts) is used so the benchmark needs no
network access.

Prints ONE JSON line:
    {"metric": ..., "value": N, "unit": "series/sec", "vs_baseline": N}

``vs_baseline`` compares against the measured torch-CPU reference equivalent
recorded in BASELINE_MEASURED.json (see tests/torch_reference.py).
"""

from __future__ import annotations

import argparse
import json
import time
from pathlib import Path

import numpy as np


def _enable_compile_cache() -> None:
    """Persistent XLA compilation cache: repeat bench runs skip the slow compile."""
    import jax

    cache_dir = Path(__file__).parent / ".jax_cache"
    cache_dir.mkdir(exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(cache_dir))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_trainer(
    batch_size: int, num_samples: int, epochs: int, tiny: bool = False, dtype: str = "bfloat16"
):
    import jax

    from multimodal_timesfm_tpu.data.collate import StackedDataset
    from multimodal_timesfm_tpu.models.decoder import (
        MultimodalDecoder,
        MultimodalDecoderConfig,
    )
    from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
    from multimodal_timesfm_tpu.parallel.mesh import make_mesh
    from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
    from multimodal_timesfm_tpu.training_args import TrainingArguments

    import jax.numpy as jnp

    compute_dtype = jnp.bfloat16 if dtype == "bfloat16" else jnp.float32
    if tiny:
        cfg = TimesFMConfig.tiny()
    else:
        cfg = TimesFMConfig(compute_dtype=compute_dtype)
    context_len = 8 * cfg.input_patch_len if tiny else 32
    horizon_len = min(cfg.output_patch_len, 32)
    num_patches = context_len // cfg.input_patch_len
    text_dims = 384

    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(cfg), MultimodalDecoderConfig(text_embedding_dims=text_dims)
    )
    params = decoder.init(jax.random.key(0))

    rng = np.random.default_rng(0)
    data = StackedDataset(
        context=rng.normal(size=(num_samples, context_len)).astype(np.float32),
        horizon=rng.normal(size=(num_samples, horizon_len)).astype(np.float32),
        text_embeddings=rng.normal(size=(num_samples, num_patches, text_dims)).astype(
            np.float32
        ),
        metadata=[{} for _ in range(num_samples)],
    )
    val = StackedDataset(
        context=data.context[: max(batch_size, 8)],
        horizon=data.horizon[: max(batch_size, 8)],
        text_embeddings=data.text_embeddings[: max(batch_size, 8)],
        metadata=[{} for _ in range(max(batch_size, 8))],
    )

    import tempfile

    tmp = tempfile.mkdtemp(prefix="bench_out_")
    args = TrainingArguments(
        output_dir=tmp,
        per_device_train_batch_size=batch_size,
        per_device_eval_batch_size=batch_size,
        num_train_epochs=epochs,
        learning_rate=1e-4,
        eval_strategy="epoch",
        save_strategy="no",
        logging_strategy="no",
        seed=0,
    )
    mesh = make_mesh() if len(jax.devices()) > 1 else None
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=args,
        train_dataset=data,
        val_dataset=val,
        mode="multimodal",
        mesh=mesh,
        frozen_cast_dtype=compute_dtype if compute_dtype != jnp.float32 else None,
    )
    return trainer


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=1024)
    # ~the augmented Time-MMD train-fold scale (5 domains x 32 shift-augment
    # multiplier); large enough that per-epoch dispatch overheads amortize to
    # steady-state throughput on the 1-core host.
    parser.add_argument("--num-samples", type=int, default=16384)
    parser.add_argument("--epochs", type=int, default=3)
    parser.add_argument("--dtype", choices=["bfloat16", "float32"], default="bfloat16")
    parser.add_argument("--tiny", action="store_true", help="Tiny model (debug)")
    parser.add_argument("--profile-dir", type=str, help="Write a jax.profiler trace here.")
    args = parser.parse_args()

    _enable_compile_cache()
    trainer = build_trainer(
        args.batch_size, args.num_samples, args.epochs + 1, args.tiny, args.dtype
    )

    # Warmup: compile train + eval programs and do the first transfers.
    trainer.train_epoch()
    trainer.validate_epoch()

    from multimodal_timesfm_tpu.utils.profiling import trace

    t0 = time.perf_counter()
    with trace(args.profile_dir or ".", enabled=bool(args.profile_dir)):
        for _ in range(args.epochs):
            trainer.train_epoch()
        trainer.validate_epoch()
    elapsed = time.perf_counter() - t0

    total_series = args.num_samples * args.epochs + len(trainer.val_data)
    series_per_sec = total_series / elapsed

    baseline_file = Path(__file__).parent / "BASELINE_MEASURED.json"
    vs_baseline = None
    if baseline_file.exists():
        baseline = json.loads(baseline_file.read_text())
        ref = baseline.get("torch_cpu_series_per_sec")
        if ref:
            vs_baseline = series_per_sec / ref

    print(
        json.dumps(
            {
                "metric": "timemmd_multimodal_finetune_series_per_sec",
                "value": round(series_per_sec, 2),
                "unit": "series/sec",
                "vs_baseline": round(vs_baseline, 2) if vs_baseline else None,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
