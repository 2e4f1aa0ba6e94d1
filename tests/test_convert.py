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


def _synthetic_state_dict(adapter, rules):
    """Build an upstream-named state dict matching the adapter's template shapes."""
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
        rule = next(r for r in rules if re.fullmatch(r[0], key))
        _, name_tpl, transform = rule
        if "{i}" in name_tpl:
            for i in range(leaf.shape[0]):
                arr = rng.normal(size=leaf.shape[1:]).astype(np.float32)
                sd[name_tpl.format(i=i)] = arr.T if transform == "t" else arr
        else:
            arr = rng.normal(size=leaf.shape).astype(np.float32)
            sd[name_tpl] = arr.T if transform == "t" else arr
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
