"""Full-pipeline accuracy parity: split -> cache -> train -> test-eval, both stacks.

The north-star metric shape (BASELINE.md: "test MSE within 1% of the torch
reference") is produced by the reference's *composition* — windowing x
caching x collate x trainer x best-checkpoint reload x sample-weighted test
eval (/root/reference/scripts/tune_time_mmd_sweep.py:148-266,
/root/reference/src/tsfmx/evaluator.py:29-71) — not by any single component.
Per-component parity (forward, trajectory, oracles) cannot catch composition
bugs, so this test runs the ENTIRE pipeline through this framework AND
through the independent torch mirror (tests/torch_reference.py) on the same
synthetic Time-MMD data: identical pickled caches, identical seeds and batch
order, then asserts the final test MSE/MAE agree within 1%.
"""

import math
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

import jax

from examples.time_mmd.cross_validation import load_fold_datasets
from examples.time_mmd.sweep_lib import FOLD_DOMAINS, fold_domain_specs
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.checkpoint import load_checkpoint
from multimodal_timesfm_tpu.training.evaluator import MultimodalEvaluator
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments

from tests.torch_reference import (
    TorchFusion,
    TorchTimesFM,
    load_jax_fusion,
    load_jax_params,
    torch_evaluate,
    torch_train_multimodal,
)

CFG = TimesFMConfig(
    input_patch_len=4, output_patch_len=8, model_dims=32, ffn_dims=32, num_layers=2, num_heads=2
)
CONTEXT, HORIZON = 16, 8
BATCH, EVAL_BATCH, EPOCHS, LR, WD, WARMUP, CLIP = 8, 8, 3, 1e-3, 0.01, 1, 1.0
SEED = 7


@pytest.fixture(scope="module")
def pipeline_caches(tmp_path_factory):
    """Synthetic Time-MMD tree -> real split + cache scripts -> pickle caches."""
    import scripts.cache_time_mmd_datasets as cache_mod
    import scripts.split_time_mmd_datasets as split_mod

    root = tmp_path_factory.mktemp("time_mmd")
    cfg_dir = tmp_path_factory.mktemp("cfg")
    cache_dir = tmp_path_factory.mktemp("cache")
    rng = np.random.default_rng(0)
    n = 120
    dates = pd.date_range("2020-01-01", periods=n, freq="D").strftime("%Y-%m-%d")
    for domain in FOLD_DOMAINS:
        num_dir = root / "numerical" / domain
        num_dir.mkdir(parents=True)
        pd.DataFrame(
            {"start_date": dates, "end_date": dates, "OT": np.cumsum(rng.normal(size=n)) + 10}
        ).to_csv(num_dir / f"{domain}.csv", index=False)
        txt_dir = root / "textual" / domain
        txt_dir.mkdir(parents=True)
        pd.DataFrame(
            {
                "start_date": dates[::10],
                "end_date": dates[9::10],
                "fact": [f"{domain} report {i}" for i in range(n // 10)],
                "preds": [f"{domain} outlook {i}" for i in range(n // 10)],
            }
        ).to_csv(txt_dir / f"{domain}_report.csv", index=False)

    (cfg_dir / "model.yml").write_text(
        yaml.safe_dump(
            {
                "adapter": {
                    "type": "timesfm",
                    "patch_len": CFG.input_patch_len,
                    "arch": {
                        "input_patch_len": CFG.input_patch_len,
                        "output_patch_len": CFG.output_patch_len,
                        "model_dims": CFG.model_dims,
                        "ffn_dims": CFG.ffn_dims,
                        "num_layers": CFG.num_layers,
                        "num_heads": CFG.num_heads,
                    },
                },
                "fusion": {"text_encoder_type": "english", "text_embedding_dims": 384},
            }
        )
    )
    (cfg_dir / "forecast.yml").write_text(
        yaml.safe_dump({"context_len": CONTEXT, "horizon_len": HORIZON})
    )

    old_argv = sys.argv
    try:
        sys.argv = [
            "split", "--data-path", str(root), "--train-ratio", "0.6", "--val-ratio", "0.2",
        ]
        assert split_mod.main() == 0
        sys.argv = [
            "cache",
            "--data-path", str(root),
            "--model-config", str(cfg_dir / "model.yml"),
            "--forecast-config", str(cfg_dir / "forecast.yml"),
            "--text-encoder-type", "english",
            "--cache-dir", str(cache_dir),
            "--seed", "0",
        ]
        assert cache_mod.main() == 0
    finally:
        sys.argv = old_argv
    return cache_dir


def _load_fold(cache_dir):
    train_specs, val_specs, test_specs = fold_domain_specs(augment_splits=set())
    return load_fold_datasets(
        train_domain_specs=train_specs,
        val_domain_specs=val_specs,
        test_domain_specs=test_specs,
        text_encoder_type="english",
        patch_len=CFG.input_patch_len,
        context_len=CONTEXT,
        horizon_len=HORIZON,
        cache_dir=cache_dir,
    )


def test_full_pipeline_test_metrics_match_torch(pipeline_caches, tmp_path):
    train_ds, val_ds, test_ds = _load_fold(pipeline_caches)
    assert len(train_ds) >= 2 * BATCH, "need multiple batches for shuffle semantics"

    # --- JAX stack: the real trainer + best reload + evaluator (sweep_lib shape) ---
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(CFG), MultimodalDecoderConfig(text_embedding_dims=384)
    )
    params = decoder.init(jax.random.key(0))
    # Host snapshot BEFORE training: the trainer donates its state buffers,
    # which invalidates the live fusion arrays the torch mirror needs.
    init_host = jax.tree.map(np.asarray, jax.device_get(params))
    args = TrainingArguments(
        output_dir=str(tmp_path / "out"),
        per_device_train_batch_size=BATCH,
        per_device_eval_batch_size=EVAL_BATCH,
        num_train_epochs=EPOCHS,
        learning_rate=LR,
        lr_scheduler_type="linear",
        warmup_steps=WARMUP,
        weight_decay=WD,
        max_grad_norm=CLIP,
        eval_strategy="epoch",
        save_strategy="best",
        logging_strategy="no",
        seed=SEED,
    )
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=args,
        train_dataset=train_ds,
        val_dataset=val_ds,
        mode="multimodal",
    )
    trainer.train()
    checkpoint = load_checkpoint(args.checkpoint_dir / "best_model.ckpt")
    trainer._load_checkpoint_state(checkpoint)
    jax_metrics = MultimodalEvaluator(decoder).evaluate(
        trainer.params, test_ds, batch_size=EVAL_BATCH, multimodal=True
    )

    # --- torch stack: independent loop over the SAME pickled caches ---
    tmodel = TorchTimesFM(
        patch_len=CFG.input_patch_len,
        output_patch_len=CFG.output_patch_len,
        model_dims=CFG.model_dims,
        ffn_dims=CFG.ffn_dims,
        num_layers=CFG.num_layers,
        num_heads=CFG.num_heads,
    )
    load_jax_params(tmodel, init_host["adapter"])
    tfusion = TorchFusion(text_dims=384, ts_dims=CFG.model_dims)
    load_jax_fusion(tfusion, init_host["fusion"])

    result = torch_train_multimodal(
        tmodel,
        tfusion,
        [train_ds[i] for i in range(len(train_ds))],
        [val_ds[i] for i in range(len(val_ds))],
        horizon_len=HORIZON,
        batch_size=BATCH,
        eval_batch_size=EVAL_BATCH,
        num_epochs=EPOCHS,
        learning_rate=LR,
        weight_decay=WD,
        warmup_steps=WARMUP,
        max_grad_norm=CLIP,
        scheduler_type="linear",
        seed=SEED,
    )
    tfusion.load_state_dict(result["best_fusion_state"])
    torch_metrics = torch_evaluate(
        tmodel,
        tfusion,
        [test_ds[i] for i in range(len(test_ds))],
        horizon_len=HORIZON,
        batch_size=EVAL_BATCH,
    )

    # The north star: end-of-pipeline test metrics within 1% (BASELINE.md).
    assert math.isfinite(jax_metrics["mse"]) and jax_metrics["mse"] > 0
    np.testing.assert_allclose(jax_metrics["mse"], torch_metrics["mse"], rtol=0.01)
    np.testing.assert_allclose(jax_metrics["mae"], torch_metrics["mae"], rtol=0.01)
    # Best-epoch selection agreed too (same val trajectory => same checkpoint).
    np.testing.assert_allclose(
        checkpoint["best_val_loss"], result["best_val_loss"], rtol=0.01
    )
