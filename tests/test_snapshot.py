"""Snapshot-driven geometry tests (VERDICT round 1, missing #2/#3).

A synthetic HF snapshot dir (config.json + model.safetensors) must round-trip
through ``from_pretrained`` with NO hard-coded geometry: the config dataclass
is populated from the checkpoint's own metadata, config.json values override
dataclass defaults, and explicit YAML ``arch`` overrides win over config.json.
Repo ids resolve against local caches (zero-egress counterpart of the
reference's HF Hub path, ``/root/reference/src/tsfmx/tsfm/chronos.py:176-199``).
"""

import json

import numpy as np
import pytest

from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config
from multimodal_timesfm_tpu.models.snapshot import (
    bert_config_from_hf,
    chronos2_config_from_hf,
    modernbert_config_from_hf,
    resolve_snapshot_dir,
    timesfm_config_from_hf,
)
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig

from tests.test_convert import _synthetic_state_dict
from multimodal_timesfm_tpu.models.convert import CHRONOS_NAME_RULES, TIMESFM_NAME_RULES


TINY_CHRONOS_HF = {
    # T5-style base fields at top level + chronos fields nested, mirroring the
    # upstream config layout the reference consumes (chronos.py:25-33,142-153).
    "d_model": 32,
    "num_layers": 2,
    "num_heads": 2,
    "d_ff": 64,
    "relative_attention_num_buckets": 32,
    "relative_attention_max_distance": 128,
    "vocab_size": 2,
    "chronos_config": {
        "input_patch_size": 4,
        "output_patch_size": 4,
        "max_output_patches": 4,
        "time_encoding_scale": 500.0,
        "use_reg_token": True,
        "quantiles": [0.1, 0.5, 0.9],
    },
}


def test_chronos_config_from_hf_nested_and_t5_names():
    cfg = chronos2_config_from_hf(TINY_CHRONOS_HF)
    assert cfg.model_dim == 32 and cfg.ffn_dim == 64 and cfg.num_layers == 2
    assert cfg.input_patch_size == 4 and cfg.max_output_patches == 4
    assert cfg.time_encoding_scale == 500.0
    assert cfg.quantiles == (0.1, 0.5, 0.9)
    # defaults survive for fields absent from config.json
    assert cfg.reg_token_id == Chronos2Config().reg_token_id


def test_timesfm_config_from_hf_aliases():
    cfg = timesfm_config_from_hf(
        {
            "patch_len": 4,
            "output_patch_len": 8,
            "hidden_size": 32,
            "intermediate_size": 32,
            "num_hidden_layers": 2,
            "num_attention_heads": 2,
            "decode_index": 3,
            "quantiles": [0.1, 0.2, 0.3, 0.4, 0.5, 0.6, 0.7],
        }
    )
    assert cfg.input_patch_len == 4 and cfg.model_dims == 32 and cfg.num_layers == 2
    assert cfg.decode_index == 3
    assert cfg.num_output_channels == 8  # point + 7 quantiles


def test_text_config_from_hf():
    b = bert_config_from_hf({"hidden_size": 16, "num_hidden_layers": 2, "vocab_size": 128})
    assert b.hidden_size == 16 and b.num_layers == 2 and b.vocab_size == 128
    m = modernbert_config_from_hf({"hidden_size": 16, "num_hidden_layers": 4, "norm_eps": 1e-6})
    assert m.hidden_size == 16 and m.num_layers == 4 and m.layer_norm_eps == 1e-6


def _write_snapshot(tmp_path, adapter_cls, config, rules, hf_config):
    from safetensors.numpy import save_file

    adapter = adapter_cls(config)
    sd, _ = _synthetic_state_dict(adapter, rules)
    # safetensors saves raw buffers: transposed views must be made contiguous.
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    snap = tmp_path / "snap"
    snap.mkdir()
    save_file(sd, str(snap / "model.safetensors"))
    (snap / "config.json").write_text(json.dumps(hf_config))
    return snap, sd


def test_chronos_from_pretrained_reads_config_json(tmp_path):
    cfg = chronos2_config_from_hf(TINY_CHRONOS_HF)
    snap, sd = _write_snapshot(tmp_path, Chronos2Adapter, cfg, CHRONOS_NAME_RULES, TINY_CHRONOS_HF)

    adapter, params = Chronos2Adapter.from_pretrained(snap)  # no config argument
    assert adapter.config == cfg
    assert adapter.point_forecast_index == 1  # 0.5 is index 1 of (0.1, 0.5, 0.9)
    np.testing.assert_array_equal(np.asarray(params["shared"]), sd["shared.weight"])


def test_timesfm_from_pretrained_reads_config_json(tmp_path):
    hf = {
        "patch_len": 4,
        "output_patch_len": 8,
        "hidden_size": 32,
        "intermediate_size": 32,
        "num_hidden_layers": 2,
        "num_attention_heads": 2,
    }
    cfg = timesfm_config_from_hf(hf)
    assert cfg == TimesFMConfig.tiny()
    snap, sd = _write_snapshot(tmp_path, TimesFM2p5Adapter, cfg, TIMESFM_NAME_RULES, hf)

    adapter, params = TimesFM2p5Adapter.from_pretrained(snap)
    assert adapter.config == cfg
    np.testing.assert_array_equal(
        np.asarray(params["tokenizer"]["hidden"]["kernel"]),
        sd["tokenizer.hidden_layer.0.weight"].T,
    )


def test_repo_id_resolves_via_snapshot_root_env(tmp_path, monkeypatch):
    cfg = Chronos2Config.tiny()
    root = tmp_path / "snapshots"
    target = root / "amazon" / "chronos-2"
    target.mkdir(parents=True)
    from safetensors.numpy import save_file

    sd, _ = _synthetic_state_dict(Chronos2Adapter(cfg), CHRONOS_NAME_RULES)
    sd = {k: np.ascontiguousarray(v) for k, v in sd.items()}
    save_file(sd, str(target / "model.safetensors"))

    monkeypatch.setenv("MULTIMODAL_TIMESFM_SNAPSHOTS", str(root))
    assert resolve_snapshot_dir("amazon/chronos-2") == target
    adapter, params = Chronos2Adapter.from_pretrained("amazon/chronos-2", config=cfg)
    np.testing.assert_array_equal(np.asarray(params["shared"]), sd["shared.weight"])


def test_repo_id_resolves_via_hf_hub_cache_layout(tmp_path, monkeypatch):
    hub = tmp_path / "hub"
    snap = hub / "models--google--timesfm-2.5-200m-pytorch" / "snapshots" / "abc123"
    snap.mkdir(parents=True)
    (snap / "config.json").write_text("{}")
    monkeypatch.setenv("HF_HUB_CACHE", str(hub))
    assert resolve_snapshot_dir("google/timesfm-2.5-200m-pytorch") == snap


def test_missing_snapshot_error_names_searched_locations(monkeypatch, tmp_path):
    monkeypatch.setenv("MULTIMODAL_TIMESFM_SNAPSHOTS", str(tmp_path / "nowhere"))
    with pytest.raises(FileNotFoundError, match="nowhere"):
        resolve_snapshot_dir("org/does-not-exist")


def test_build_adapter_arch_overrides_win_over_config_json(tmp_path):
    """Precedence: YAML arch > snapshot config.json > dataclass defaults."""
    from examples.time_mmd.configs.model import AdapterConfig, FusionConfig, ModelConfig
    from examples.time_mmd.sweep_lib import build_adapter

    snap = tmp_path / "snap"
    snap.mkdir()
    (snap / "config.json").write_text(json.dumps(TINY_CHRONOS_HF))

    model_config = ModelConfig(
        adapter=AdapterConfig(type="chronos", patch_len=4, arch={"max_output_patches": 2}),
        fusion=FusionConfig(text_encoder_type="english", text_embedding_dims=384),
    )
    adapter = build_adapter(model_config, str(snap))
    assert adapter.config.max_output_patches == 2  # YAML arch wins
    assert adapter.config.model_dim == 32  # config.json wins over the 768 default
    assert adapter.config.time_encoding_scale == 500.0


def test_english_encoder_geometry_from_config_json(tmp_path):
    """Text encoder adopts the snapshot's config.json geometry (not hard-coded MiniLM)."""
    import jax
    from safetensors.numpy import save_file

    from multimodal_timesfm_tpu.text.bert import BertConfig, init_bert
    from multimodal_timesfm_tpu.text.encoders import EnglishTextEncoder

    cfg = BertConfig.tiny()
    params = jax.device_get(init_bert(jax.random.key(0), cfg))

    # Re-emit the pytree under HF BERT names (inverse of convert_hf_bert_state).
    sd = {
        "embeddings.word_embeddings.weight": np.asarray(params["embeddings"]["word"]),
        "embeddings.position_embeddings.weight": np.asarray(params["embeddings"]["position"]),
        "embeddings.token_type_embeddings.weight": np.asarray(params["embeddings"]["token_type"]),
        "embeddings.LayerNorm.weight": np.asarray(params["embeddings"]["ln"]["scale"]),
        "embeddings.LayerNorm.bias": np.asarray(params["embeddings"]["ln"]["bias"]),
    }
    hf_names = {
        "q": "attention.self.query",
        "k": "attention.self.key",
        "v": "attention.self.value",
        "attn_out": "attention.output.dense",
        "ffn_up": "intermediate.dense",
        "ffn_down": "output.dense",
    }
    for i, layer in enumerate(params["layers"]):
        for ours, theirs in hf_names.items():
            sd[f"encoder.layer.{i}.{theirs}.weight"] = np.asarray(layer[ours]["kernel"]).T
            sd[f"encoder.layer.{i}.{theirs}.bias"] = np.asarray(layer[ours]["bias"])
        sd[f"encoder.layer.{i}.attention.output.LayerNorm.weight"] = np.asarray(layer["attn_ln"]["scale"])
        sd[f"encoder.layer.{i}.attention.output.LayerNorm.bias"] = np.asarray(layer["attn_ln"]["bias"])
        sd[f"encoder.layer.{i}.output.LayerNorm.weight"] = np.asarray(layer["ffn_ln"]["scale"])
        sd[f"encoder.layer.{i}.output.LayerNorm.bias"] = np.asarray(layer["ffn_ln"]["bias"])

    snap = tmp_path / "snap"
    snap.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in sd.items()}, str(snap / "model.safetensors"))
    (snap / "config.json").write_text(
        json.dumps(
            {
                "hidden_size": cfg.hidden_size,
                "num_hidden_layers": cfg.num_layers,
                "num_attention_heads": cfg.num_heads,
                "intermediate_size": cfg.intermediate_size,
                "vocab_size": cfg.vocab_size,
                "max_position_embeddings": cfg.max_position_embeddings,
            }
        )
    )
    (snap / "vocab.txt").write_text("\n".join(["[PAD]", "[UNK]", "[CLS]", "[SEP]", "the", "a"]))

    enc = EnglishTextEncoder(snap, embedding_dim=cfg.hidden_size)
    assert enc.config == cfg
    assert enc.is_pretrained
    out = enc(["the a", "a"])
    assert out.shape == (2, cfg.hidden_size)
    assert np.all(np.isfinite(out))


def test_build_adapter_accepts_repo_id(tmp_path, monkeypatch):
    """CLI --pretrained-dir accepts an HF repo id when a local snapshot exists."""
    from examples.time_mmd.configs.model import AdapterConfig, FusionConfig, ModelConfig
    from examples.time_mmd.sweep_lib import build_adapter

    root = tmp_path / "snaps"
    target = root / "amazon" / "chronos-2"
    target.mkdir(parents=True)
    (target / "config.json").write_text(json.dumps(TINY_CHRONOS_HF))
    monkeypatch.setenv("MULTIMODAL_TIMESFM_SNAPSHOTS", str(root))

    model_config = ModelConfig(
        adapter=AdapterConfig(type="chronos", patch_len=4, arch={}),
        fusion=FusionConfig(text_encoder_type="english", text_embedding_dims=384),
    )
    adapter = build_adapter(model_config, "amazon/chronos-2")
    assert adapter.config.model_dim == 32


def test_hub_cache_prefers_weighted_revision_and_refs_main(tmp_path, monkeypatch):
    hub = tmp_path / "hub"
    base = hub / "models--org--m"
    old = base / "snapshots" / "aaa"
    new = base / "snapshots" / "bbb"
    old.mkdir(parents=True)
    new.mkdir(parents=True)
    (old / "config.json").write_text("{}")
    (old / "model.safetensors").write_bytes(b"x")
    (new / "config.json").write_text("{}")  # aborted download: config only, newer mtime
    import os

    os.utime(old, (1, 1))
    monkeypatch.setenv("HF_HUB_CACHE", str(hub))
    assert resolve_snapshot_dir("org/m") == old  # weights win over newer config-only

    (base / "refs").mkdir()
    (base / "refs" / "main").write_text("bbb")
    (new / "model.safetensors").write_bytes(b"y")
    assert resolve_snapshot_dir("org/m") == new  # refs/main pointer wins once usable


def test_timesfm_config_null_num_output_channels():
    """An explicit null num_output_channels must not block the
    quantiles-derived channel count (review finding: presence check vs the
    None-aware _pick used everywhere else)."""
    from multimodal_timesfm_tpu.models.snapshot import timesfm_config_from_hf

    cfg = timesfm_config_from_hf(
        {"quantiles": [0.1, 0.5, 0.9], "num_output_channels": None}
    )
    assert cfg.num_output_channels == 4


def test_chronos_config_rejects_tiny_rel_pos_buckets():
    """rel_pos_buckets < 4 produces NaN bucket indices in _relative_bucket's
    log branch — refused at construction (review finding)."""
    import dataclasses

    import pytest

    from multimodal_timesfm_tpu.models.chronos import Chronos2Config

    with pytest.raises(ValueError, match="rel_pos_buckets"):
        dataclasses.replace(Chronos2Config.tiny(), rel_pos_buckets=2)


def test_chronos_config_rejects_unequal_patch_sizes():
    """input_patch_size != output_patch_size would crash deep inside forward
    (the shared input_patch_embedding embeds the output_patch_size-shaped
    future placeholders, reference chronos.py:82-99) — refused loudly at
    construction with a pointer to max_output_patches."""
    import dataclasses

    import pytest

    from multimodal_timesfm_tpu.models.chronos import Chronos2Config

    with pytest.raises(ValueError, match="max_output_patches"):
        dataclasses.replace(Chronos2Config.tiny(), output_patch_size=8)
