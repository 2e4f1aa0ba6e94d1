"""Checkpoint converter tests: synthetic upstream-style state dicts -> pytrees."""

import numpy as np
import pytest

from multimodal_timesfm_tpu.models.convert import (
    CHRONOS_NAME_RULES,
    TIMESFM_NAME_RULES,
    convert_safetensors,
    load_backbone_checkpoint,
)
from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig


def _synthetic_state_dict(adapter, rules, candidate=0):
    """Build an upstream-named state dict matching the adapter's template shapes.

    ``candidate`` selects which upstream naming candidate to emit per rule
    (0 = primary; falls back to the last available for rules with fewer).
    Random N(0,1) values keep the "rms" transform a no-op (mean ~ 0), so
    round-trips stay exact.
    """
    import jax

    template = adapter.init(jax.random.key(0))
    flat, _ = jax.tree_util.tree_flatten_with_path(template)
    sd = {}
    rng = np.random.default_rng(0)
    import re

    for path, leaf in flat:
        key = "/".join(
            p.key if isinstance(p, jax.tree_util.DictKey) else "" for p in path
        ).strip("/").replace("//", "/")
        _, candidates = next(r for r in rules if re.fullmatch(r[0], key))
        name_tpl, transform = candidates[min(candidate, len(candidates) - 1)]

        def emit(name: str, shape):
            arr = rng.normal(size=shape).astype(np.float32)
            if transform == "t":
                sd[name] = np.ascontiguousarray(arr.T)
            elif transform == "split_t":
                third = arr.shape[1] // 3
                for j, p in enumerate(("q", "k", "v")):
                    sd[name.format(p=p)] = np.ascontiguousarray(
                        arr[:, j * third : (j + 1) * third].T
                    )
            elif transform == "split_b":
                third = arr.shape[0] // 3
                for j, p in enumerate(("q", "k", "v")):
                    sd[name.format(p=p)] = arr[j * third : (j + 1) * third]
            else:
                sd[name] = arr

        if "{i}" in name_tpl:
            for i in range(leaf.shape[0]):
                emit(name_tpl.replace("{i}", str(i)), leaf.shape[1:])
        else:
            emit(name_tpl, leaf.shape)
    return sd, template


def test_timesfm_conversion_roundtrip():
    import jax

    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, template = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    params = convert_safetensors(sd, adapter)

    # structure and shapes match the template
    jax.tree.map(lambda a, b: (_ for _ in ()).throw(AssertionError()) if a.shape != b.shape else None,
                 params, template)
    # transposes applied: tokenizer hidden kernel equals sd value transposed
    np.testing.assert_array_equal(
        np.asarray(params["tokenizer"]["hidden"]["kernel"]),
        sd["tokenizer.hidden_layer.0.weight"].T,
    )
    # stacked layers gathered in order
    np.testing.assert_array_equal(
        np.asarray(params["stacked_xf"]["attn_norm"]["scale"][1]),
        sd["stacked_xf.1.input_layernorm.weight"],
    )


def test_chronos_conversion_roundtrip():
    adapter = Chronos2Adapter(Chronos2Config.tiny())
    sd, template = _synthetic_state_dict(adapter, CHRONOS_NAME_RULES)
    params = convert_safetensors(sd, adapter)
    np.testing.assert_array_equal(np.asarray(params["shared"]), sd["shared.weight"])
    np.testing.assert_array_equal(
        np.asarray(params["encoder"]["layers"]["ffn_up"]["kernel"][0]),
        sd["encoder.block.0.layer.1.DenseReluDense.wi.weight"].T,
    )


def test_strict_conversion_fails_on_missing_tensor():
    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    del sd["tokenizer.hidden_layer.0.weight"]
    with pytest.raises(ValueError, match="unmatched template leaves"):
        convert_safetensors(sd, adapter)


def test_conversion_fails_on_shape_mismatch():
    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    sd["tokenizer.hidden_layer.0.weight"] = np.zeros((3, 3), np.float32)
    with pytest.raises(ValueError, match="checkpoint shape"):
        convert_safetensors(sd, adapter)


def test_prefixed_names_accepted():
    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    sd = {f"model.{k}": v for k, v in sd.items()}
    params = convert_safetensors(sd, adapter)
    assert params["tokenizer"]["hidden"]["kernel"].shape == (8, 32)


def test_load_backbone_from_framework_ckpt(tmp_path):
    """load_backbone_checkpoint accepts this framework's pickled checkpoints."""
    import jax
    import pickle

    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    params = jax.device_get(adapter.init(jax.random.key(3)))
    path = tmp_path / "adapter.ckpt"
    with open(path, "wb") as f:
        pickle.dump({"adapter_params": params}, f)
    restored = load_backbone_checkpoint(path, adapter)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        restored,
        params,
    )


def test_adapter_from_pretrained_api(tmp_path):
    """Adapter-level load_checkpoint/from_pretrained (reference API surface)."""
    import jax
    import pickle

    src = TimesFM2p5Adapter(TimesFMConfig.tiny())
    params = jax.device_get(src.init(jax.random.key(9)))
    with open(tmp_path / "model.ckpt", "wb") as f:
        pickle.dump({"adapter_params": params}, f)

    adapter, restored = TimesFM2p5Adapter.from_pretrained(
        tmp_path, config=TimesFMConfig.tiny()
    )
    assert adapter.patch_len == 4
    np.testing.assert_array_equal(
        np.asarray(restored["tokenizer"]["hidden"]["kernel"]),
        np.asarray(params["tokenizer"]["hidden"]["kernel"]),
    )


def test_timesfm_alternate_upstream_names():
    """Candidate naming: HF-lineage split q/k/v + input_layer residual blocks."""
    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, template = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES, candidate=1)
    assert "stacked_xf.0.self_attn.q_proj.weight" in sd  # split form emitted
    assert "tokenizer.input_layer.weight" in sd
    params = convert_safetensors(sd, adapter)
    # fused qkv kernel = concat of the three transposed projections
    third = params["stacked_xf"]["attn"]["qkv"]["kernel"].shape[-1] // 3
    np.testing.assert_array_equal(
        np.asarray(params["stacked_xf"]["attn"]["qkv"]["kernel"][0, :, third : 2 * third]),
        sd["stacked_xf.0.self_attn.k_proj.weight"].T,
    )
    np.testing.assert_array_equal(
        np.asarray(params["tokenizer"]["hidden"]["kernel"]),
        sd["tokenizer.input_layer.weight"].T,
    )


def test_rmsnorm_weight_convention_autodetected():
    """Ones-centered RMSNorm weights (torch convention) are shifted to our scale."""
    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    for i in range(2):
        sd[f"stacked_xf.{i}.input_layernorm.weight"] = np.full(32, 1.25, np.float32)
    params = convert_safetensors(sd, adapter)
    # (1 + scale) must reproduce the upstream weight: scale = 1.25 - 1
    np.testing.assert_allclose(
        np.asarray(params["stacked_xf"]["attn_norm"]["scale"]), 0.25, atol=1e-6
    )
    # zero-centered scales (PAX convention) pass through untouched
    sd[f"stacked_xf.0.input_layernorm.weight"] = np.full(32, 0.1, np.float32)
    sd[f"stacked_xf.1.input_layernorm.weight"] = np.full(32, 0.1, np.float32)
    params = convert_safetensors(sd, adapter)
    np.testing.assert_allclose(
        np.asarray(params["stacked_xf"]["attn_norm"]["scale"]), 0.1, atol=1e-6
    )


def test_load_backbone_from_bin_snapshot(tmp_path):
    """pytorch_model.bin snapshots load through load_backbone_checkpoint —
    resolve_snapshot_dir accepts them, so the loader must too (review
    finding: the directory branch only checked model.safetensors)."""
    import torch

    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    torch.save(
        {k: torch.from_numpy(v) for k, v in sd.items()}, tmp_path / "pytorch_model.bin"
    )
    params = load_backbone_checkpoint(tmp_path, adapter)
    np.testing.assert_array_equal(
        np.asarray(params["tokenizer"]["hidden"]["kernel"]),
        sd["tokenizer.hidden_layer.0.weight"].T,
    )


def test_rmsnorm_negative_mean_not_shifted():
    """A strongly NEGATIVE-mean tensor is a drifted zero-centered scale, not
    the weight convention (which clusters at +1) — subtracting 1 from it
    would silently invert activations (review finding: abs(mean) misfired)."""
    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    num_layers = TimesFMConfig.tiny().num_layers
    for i in range(num_layers):
        name = f"stacked_xf.{i}.input_layernorm.weight"
        sd[name] = np.full_like(sd[name], -0.8)
    params = convert_safetensors(sd, adapter)
    np.testing.assert_allclose(np.asarray(params["stacked_xf"]["attn_norm"]["scale"]), -0.8)


def test_multimodal_checkpoint_rejected_with_clear_error(tmp_path):
    """Pointing the backbone loader at a fusion-only training checkpoint
    raises a targeted error, not a raw pytree-structure mismatch."""
    import pickle

    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    path = tmp_path / "best_model.ckpt"
    with open(path, "wb") as f:
        pickle.dump(
            {"fusion_params": {"w": np.zeros(3)}, "optimizer_state": {}, "epoch": 1}, f
        )
    with pytest.raises(ValueError, match="without backbone weights"):
        load_backbone_checkpoint(path, adapter)


def test_multiple_ckpts_pick_deterministic(tmp_path):
    """A directory with several pickles loads the lexicographically first one
    (review finding: unsorted glob picked an arbitrary file)."""
    import jax
    import pickle

    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    p_a = jax.device_get(adapter.init(jax.random.key(1)))
    p_b = jax.device_get(adapter.init(jax.random.key(2)))
    with open(tmp_path / "epoch_2.ckpt", "wb") as f:
        pickle.dump({"adapter_params": p_b}, f)
    with open(tmp_path / "best.ckpt", "wb") as f:
        pickle.dump({"adapter_params": p_a}, f)
    restored = load_backbone_checkpoint(tmp_path, adapter)  # "best.ckpt" sorts first
    np.testing.assert_array_equal(
        np.asarray(restored["tokenizer"]["hidden"]["kernel"]),
        np.asarray(p_a["tokenizer"]["hidden"]["kernel"]),
    )


def test_failed_candidate_does_not_suppress_unused_warning(caplog):
    """Tensors touched by a candidate that ultimately fails still count as
    unconsumed (review finding: partial matches were marked used, hiding
    exactly the mapping mistakes the warning exists to surface)."""
    import logging

    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)  # fused qkv_proj names
    # a stray split-projection tensor for layer 0 only: the split candidate
    # finds it, then fails on the missing k/v siblings and falls through to
    # the fused candidate — the stray must still be reported unconsumed.
    # (split_t is tried AFTER qkv_proj, but used-marking must be atomic
    # regardless of order.)
    stray = "stacked_xf.0.self_attn.q_proj.weight"
    sd[stray] = np.zeros((8, 8), np.float32)
    with caplog.at_level(logging.WARNING):
        convert_safetensors(sd, adapter)
    assert any(stray in rec.getMessage() for rec in caplog.records)


def test_load_bin_bf16_checkpoint(tmp_path):
    """bf16 pytorch_model.bin loads (numpy has no bf16; upcast is exact)."""
    import torch

    adapter = TimesFM2p5Adapter(TimesFMConfig.tiny())
    sd, _ = _synthetic_state_dict(adapter, TIMESFM_NAME_RULES)
    torch.save(
        {k: torch.from_numpy(v).to(torch.bfloat16) for k, v in sd.items()},
        tmp_path / "pytorch_model.bin",
    )
    params = load_backbone_checkpoint(tmp_path, adapter)
    np.testing.assert_allclose(
        np.asarray(params["tokenizer"]["hidden"]["kernel"]),
        sd["tokenizer.hidden_layer.0.weight"].T,
        atol=0.01,  # bf16 storage rounding
    )
