"""End-to-end integration: split -> cache -> local sweep, both backbones.

Miniature versions of the five driver configs (BASELINE.md): baseline and
multimodal fine-tune + eval on synthetic Time-MMD-format data through the
real CLI entry points (mains called in-process).
"""

import json
import sys

import numpy as np
import pandas as pd
import pytest
import yaml

from examples.time_mmd.sweep_lib import FOLD_DOMAINS


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Synthetic Time-MMD tree with all five fold domains."""
    root = tmp_path_factory.mktemp("time_mmd")
    rng = np.random.default_rng(0)
    n = 120
    dates = pd.date_range("2020-01-01", periods=n, freq="D").strftime("%Y-%m-%d")
    for domain in FOLD_DOMAINS:
        num_dir = root / "numerical" / domain
        num_dir.mkdir(parents=True)
        pd.DataFrame(
            {
                "start_date": dates,
                "end_date": dates,
                "OT": np.cumsum(rng.normal(size=n)) + 10,
            }
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
    return root


@pytest.fixture(scope="module")
def configs(tmp_path_factory):
    cfg_dir = tmp_path_factory.mktemp("configs")
    model_cfg = {
        "adapter": {
            "type": "timesfm",
            "patch_len": 4,
            "arch": {
                "input_patch_len": 4,
                "output_patch_len": 8,
                "model_dims": 32,
                "ffn_dims": 32,
                "num_layers": 2,
                "num_heads": 2,
            },
        },
        "fusion": {"text_encoder_type": "english", "text_embedding_dims": 384},
    }
    (cfg_dir / "model.yml").write_text(yaml.safe_dump(model_cfg))
    chronos_cfg = {
        "adapter": {
            "type": "chronos",
            "patch_len": 4,
            "arch": {
                "model_dim": 32,
                "num_layers": 2,
                "num_heads": 2,
                "ffn_dim": 64,
                "input_patch_size": 4,
                "output_patch_size": 4,
                "max_output_patches": 2,
            },
        },
        "fusion": {"text_encoder_type": "english", "text_embedding_dims": 384},
    }
    (cfg_dir / "chronos.yml").write_text(yaml.safe_dump(chronos_cfg))
    (cfg_dir / "forecast.yml").write_text(yaml.safe_dump({"context_len": 16, "horizon_len": 8}))
    sweep_cfg = {
        "method": "bayes",
        "metric": {"name": "test/mse", "goal": "minimize"},
        "parameters": {
            "num_fusion_layers": {"value": 1},
            "batch_size": {"values": [8]},
            "num_epochs": {"values": [2]},
            "learning_rate": {"distribution": "log_uniform_values", "min": 1e-4, "max": 1e-3},
            "lr_scheduler_type": {"values": ["cosine"]},
            "warmup_steps": {"distribution": "uniform", "min": 0.0, "max": 0.1},
            "weight_decay": {"distribution": "log_uniform_values", "min": 1e-4, "max": 1e-2},
            "gradient_accumulation_steps": {"values": [1]},
        },
    }
    (cfg_dir / "sweep.yml").write_text(yaml.safe_dump(sweep_cfg))
    return cfg_dir


def _run(monkeypatch, module, argv):
    monkeypatch.setattr(sys, "argv", argv)
    assert module.main() == 0


@pytest.fixture(scope="module")
def split_and_cache(data_root, configs, tmp_path_factory):
    """Run the split + cache scripts once for the module."""
    import scripts.split_time_mmd_datasets as split_mod
    import scripts.cache_time_mmd_datasets as cache_mod

    cache_dir = tmp_path_factory.mktemp("cache")
    argv_split = [
        "split", "--data-path", str(data_root), "--train-ratio", "0.6", "--val-ratio", "0.2",
    ]
    old_argv = sys.argv
    try:
        sys.argv = argv_split
        assert split_mod.main() == 0
        for augment in ([], ["--augment"]):
            sys.argv = [
                "cache",
                "--data-path", str(data_root),
                "--model-config", str(configs / "model.yml"),
                "--forecast-config", str(configs / "forecast.yml"),
                "--text-encoder-type", "english",
                "--cache-dir", str(cache_dir),
                "--seed", "0",
            ] + augment
            assert cache_mod.main() == 0
    finally:
        sys.argv = old_argv
    return cache_dir


def test_split_outputs(data_root, split_and_cache):
    for split in ("train", "val", "test"):
        d = f"Agriculture_{split}"
        assert (data_root / "numerical" / d / f"{d}.csv").exists()
        assert (data_root / "textual" / d / f"{d}_report.csv").exists()


def test_cache_outputs(split_and_cache):
    files = sorted(p.name for p in split_and_cache.glob("*.pkl"))
    assert any("Agriculture_train" in f and f.endswith("aug.pkl") for f in files)
    assert any("Agriculture_train" in f and not f.endswith("aug.pkl") for f in files)


@pytest.mark.parametrize(
    "mode,model_yml",
    [("multimodal", "model.yml"), ("baseline", "model.yml"), ("multimodal", "chronos.yml")],
)
def test_local_sweep_end_to_end(
    data_root, configs, split_and_cache, tmp_path, monkeypatch, mode, model_yml
):
    import scripts.tune_time_mmd_sweep as sweep_mod

    out_dir = tmp_path / f"sweep_{mode}_{model_yml}"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "tune",
            "--sweep-config", str(configs / "sweep.yml"),
            "--count", "1",
            "--model-config", str(configs / model_yml),
            "--forecast-config", str(configs / "forecast.yml"),
            "--cache-dir", str(split_and_cache),
            "--offline",
            "--output-dir", str(out_dir),
            "--seed", "0",
        ],
    )
    assert sweep_mod.main(mode=mode) == 0

    results = (out_dir / "sweep_results.jsonl").read_text().strip().splitlines()
    final = json.loads(results[-1])
    assert "test/mse" in final and np.isfinite(final["test/mse"])
    assert "val/best_loss" in final


@pytest.mark.parametrize("model_yml", ["model.yml", "chronos.yml"])
def test_vectorized_sweep_matches_sequential(
    data_root, configs, split_and_cache, tmp_path, monkeypatch, model_yml
):
    """--vectorized trains all trials in one dispatch yet logs the same
    per-trial val/best_loss as the sequential driver (same sampled configs)."""
    import scripts.tune_time_mmd_sweep as sweep_mod

    outs = {}
    for label, extra in (("seq", []), ("vec", ["--vectorized"])):
        out_dir = tmp_path / f"sweep_{label}"
        monkeypatch.setattr(
            sys,
            "argv",
            [
                "tune",
                "--sweep-config", str(configs / "sweep.yml"),
                "--count", "2",
                "--model-config", str(configs / model_yml),
                "--forecast-config", str(configs / "forecast.yml"),
                "--cache-dir", str(split_and_cache),
                "--offline",
                "--output-dir", str(out_dir),
                "--seed", "0",
            ] + extra,
        )
        assert sweep_mod.main(mode="multimodal") == 0
        rows = [
            json.loads(line)
            for line in (out_dir / "sweep_results.jsonl").read_text().strip().splitlines()
        ]
        outs[label] = {
            r["run_id"]: r for r in rows if "val/best_loss" in r
        }

    assert set(outs["seq"]) == set(outs["vec"]) == {"local-0", "local-1"}
    for run_id in outs["seq"]:
        np.testing.assert_allclose(
            outs["vec"][run_id]["val/best_loss"],
            outs["seq"][run_id]["val/best_loss"],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            outs["vec"][run_id]["test/mse"], outs["seq"][run_id]["test/mse"], rtol=5e-3
        )


def test_vectorized_baseline_sweep_matches_sequential(
    data_root, configs, split_and_cache, tmp_path, monkeypatch
):
    """Baseline mode vectorizes at small geometries (VERDICT r2 #7): the
    tiny-backbone trials fit the 5x-tree HBM budget, train in one dispatch,
    and log the same val/best_loss as the sequential baseline driver."""
    import scripts.tune_time_mmd_sweep as sweep_mod

    outs = {}
    for label, extra in (("seq", []), ("vec", ["--vectorized"])):
        out_dir = tmp_path / f"base_{label}"
        monkeypatch.setattr(
            sys,
            "argv",
            [
                "tune",
                "--sweep-config", str(configs / "sweep.yml"),
                "--count", "2",
                "--model-config", str(configs / "model.yml"),
                "--forecast-config", str(configs / "forecast.yml"),
                "--cache-dir", str(split_and_cache),
                "--offline",
                "--output-dir", str(out_dir),
                "--seed", "0",
            ] + extra,
        )
        assert sweep_mod.main(mode="baseline") == 0
        rows = [
            json.loads(line)
            for line in (out_dir / "sweep_results.jsonl").read_text().strip().splitlines()
        ]
        outs[label] = {r["run_id"]: r for r in rows if "val/best_loss" in r}

    assert set(outs["seq"]) == set(outs["vec"]) == {"local-0", "local-1"}
    for run_id in outs["seq"]:
        np.testing.assert_allclose(
            outs["vec"][run_id]["val/best_loss"],
            outs["seq"][run_id]["val/best_loss"],
            rtol=1e-4,
        )
        np.testing.assert_allclose(
            outs["vec"][run_id]["test/mse"], outs["seq"][run_id]["test/mse"], rtol=5e-3
        )


def test_vectorized_baseline_rejects_over_budget_group(
    data_root, configs, split_and_cache, tmp_path, monkeypatch
):
    """An oversized baseline group raises with the computed HBM budget
    (guard message carries the arithmetic; sweep_lib.train_and_evaluate_many)."""
    from multimodal_timesfm_tpu.training import vectorized as vec_mod

    import scripts.tune_time_mmd_sweep as sweep_mod

    # Pretend the device has 1MB of HBM so even the tiny geometry overflows.
    monkeypatch.setattr(vec_mod, "device_hbm_bytes", lambda default=0: 1 << 20)
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "tune",
            "--sweep-config", str(configs / "sweep.yml"),
            "--count", "2",
            "--model-config", str(configs / "model.yml"),
            "--forecast-config", str(configs / "forecast.yml"),
            "--cache-dir", str(split_and_cache),
            "--offline", "--vectorized",
            "--output-dir", str(tmp_path / "nope"),
        ],
    )
    # The group fails with the budget error logged per trial; with every
    # trial failed the driver raises.
    import pytest as _pytest

    with _pytest.raises(RuntimeError, match="failed"):
        sweep_mod.main(mode="baseline")
    rows = [
        json.loads(line)
        for line in (tmp_path / "nope" / "sweep_results.jsonl").read_text().strip().splitlines()
    ]
    assert any("exceeds the device budget" in r.get("error", "") for r in rows)


def test_vectorized_baseline_budget_is_per_device(
    data_root, configs, split_and_cache, tmp_path, monkeypatch
):
    """The 5x-tree HBM budget divides over the mesh data axis: a group whose
    trials overflow ONE device still runs when the trial axis shards over the
    8-device mesh (1 trial/chip). Review finding r3: the guard previously
    compared the whole group against a single device's budget."""
    import jax

    from examples.time_mmd.configs.model import ModelConfig
    from examples.time_mmd.sweep_lib import build_adapter, init_decoder_params
    from multimodal_timesfm_tpu.models.decoder import (
        MultimodalDecoder,
        MultimodalDecoderConfig,
    )
    from multimodal_timesfm_tpu.training import vectorized as vec_mod

    import scripts.tune_time_mmd_sweep as sweep_mod

    # HBM budget that fits exactly ONE tiny-baseline trial per device
    # (same trainable_bytes arithmetic as the guard).
    model_config = ModelConfig.from_yaml(configs / "model.yml")
    decoder = MultimodalDecoder(
        build_adapter(model_config, None),
        MultimodalDecoderConfig(
            text_embedding_dims=model_config.fusion.text_embedding_dims
        ),
    )
    params = init_decoder_params(decoder, None, 0)
    trainable_bytes = sum(
        int(np.prod(x.shape)) * 4 for x in jax.tree.leaves(params["adapter"])
    )
    one_per_device = int(5 * trainable_bytes / 0.75) + 4096
    assert vec_mod.vectorized_max_trials(trainable_bytes, one_per_device) == 1
    monkeypatch.setattr(vec_mod, "device_hbm_bytes", lambda default=0: one_per_device)

    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest pins an 8-device virtual mesh"
    out_dir = tmp_path / "per_device"
    monkeypatch.setattr(
        sys,
        "argv",
        [
            "tune",
            "--sweep-config", str(configs / "sweep.yml"),
            "--count", str(n_dev),
            "--model-config", str(configs / "model.yml"),
            "--forecast-config", str(configs / "forecast.yml"),
            "--cache-dir", str(split_and_cache),
            "--offline", "--vectorized",
            "--output-dir", str(out_dir),
            "--seed", "0",
        ],
    )
    assert sweep_mod.main(mode="baseline") == 0
    rows = [
        json.loads(line)
        for line in (out_dir / "sweep_results.jsonl").read_text().strip().splitlines()
    ]
    finished = [r for r in rows if "val/best_loss" in r]
    assert len(finished) == n_dev
    assert all(np.isfinite(r["val/best_loss"]) for r in finished)


def test_cache_declared_dim_ignores_mismatched_fusion_config():
    """A japanese caching run with a default (english/384) model config must
    fall back to the encoder's own dim, not crash on 384 vs 768 (review
    finding r3): the declared dim only applies when the fusion config
    describes the encoder being built."""
    from examples.time_mmd.configs.model import FusionConfig
    from scripts.cache_time_mmd_datasets import declared_embedding_dim

    english_cfg = FusionConfig(text_encoder_type="english", text_embedding_dims=384)
    assert declared_embedding_dim("english", english_cfg) == 384
    assert declared_embedding_dim("japanese", english_cfg) is None  # per-type default
    ja_cfg = FusionConfig(text_encoder_type="japanese", text_embedding_dims=768)
    assert declared_embedding_dim("japanese", ja_cfg) == 768


def test_vectorized_sweep_observes_and_continues_numbering(
    data_root, configs, split_and_cache, tmp_path, monkeypatch
):
    """--vectorized feeds trial results to the durable TPE state and a
    relaunch continues run-id numbering (review findings r3)."""
    import scripts.tune_time_mmd_sweep as sweep_mod

    out_dir = tmp_path / "vec_resume"
    for _ in range(2):
        monkeypatch.setattr(
            sys,
            "argv",
            [
                "tune",
                "--sweep-config", str(configs / "sweep.yml"),
                "--count", "1",
                "--model-config", str(configs / "model.yml"),
                "--forecast-config", str(configs / "forecast.yml"),
                "--cache-dir", str(split_and_cache),
                "--offline", "--vectorized",
                "--output-dir", str(out_dir),
                "--seed", "0",
            ],
        )
        assert sweep_mod.main(mode="multimodal") == 0

    state = (out_dir / "sweep_state.jsonl").read_text().strip().splitlines()
    assert len(state) == 2  # both launches observed their trial
    rows = [
        json.loads(line)
        for line in (out_dir / "sweep_results.jsonl").read_text().strip().splitlines()
    ]
    ids = {r["run_id"] for r in rows}
    assert {"local-0", "local-1"} <= ids


def test_vectorized_rejects_sweep_id(tmp_path, monkeypatch):
    """--vectorized runs the LOCAL engine; silently ignoring --sweep-id would
    leave the requested W&B sweep without the contributed trials (review
    finding) — refuse loudly instead."""
    import scripts.tune_time_mmd_sweep as sweep_mod

    monkeypatch.setattr(
        sys,
        "argv",
        [
            "tune",
            "--sweep-id", "abc123",
            "--sweep-config", str(tmp_path / "s.yml"),
            "--vectorized", "--offline",
            "--output-dir", str(tmp_path / "out"),
        ],
    )
    assert sweep_mod.main() == 1
