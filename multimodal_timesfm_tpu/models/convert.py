"""Pretrained backbone checkpoint -> JAX pytree conversion.

The reference downloads ``model.safetensors`` from HF Hub and strict-loads it
into the upstream torch modules (``/root/reference/src/tsfmx/tsfm/timesfm.py:131-158``,
``chronos.py:176-199``). This environment has no network access, so loading
goes through a *local* directory instead:

  * a directory containing ``model.safetensors`` (an HF snapshot), or
  * a ``.ckpt``/``.pkl`` pickle of a params pytree saved by this framework.

Safetensors name mapping: upstream tensor names are mapped through
``TIMESFM_NAME_RULES`` / ``CHRONOS_NAME_RULES`` below. The rules cover the
structural mapping (tokenizer/stacked_xf/output heads; torch (out,in) weights
transposed to (in,out) kernels; per-layer tensors stacked on a leading axis).
Because the upstream packages are unavailable offline, the exact upstream
tensor names could not be verified against a real checkpoint yet — the rules
are written against the module structure the reference code exercises and
will be finalized the first time a real snapshot is present (conversion fails
loudly listing unmatched names rather than loading silently wrong).
"""

from __future__ import annotations

import pickle
import re
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_timesfm_tpu.models.base import Params, TsfmAdapter
from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()


def _load_safetensors(path: Path) -> dict[str, np.ndarray]:
    from safetensors.numpy import load_file

    return dict(load_file(str(path)))


def load_backbone_checkpoint(path: Path, adapter: TsfmAdapter) -> Params:
    """Load backbone params from a local checkpoint directory or file."""
    path = Path(path)
    if path.is_dir():
        st = path / "model.safetensors"
        if st.exists():
            return convert_safetensors(_load_safetensors(st), adapter)
        candidates = list(path.glob("*.ckpt")) + list(path.glob("*.pkl"))
        if candidates:
            path = candidates[0]
        else:
            raise FileNotFoundError(f"No model.safetensors or .ckpt/.pkl under {path}")
    if path.suffix == ".safetensors":
        return convert_safetensors(_load_safetensors(path), adapter)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    params = payload.get("adapter_params", payload) if isinstance(payload, dict) else payload
    template = adapter.init(jax.random.key(0))
    return jax.tree.map(lambda ref, v: jnp.asarray(v, ref.dtype), template, params)


def convert_safetensors(sd: dict[str, np.ndarray], adapter: TsfmAdapter) -> Params:
    """Map an upstream safetensors state dict onto the adapter's pytree.

    Strategy: build the adapter's params template, then for every leaf find
    the upstream tensor via the adapter-specific name rules. Any unmatched
    template leaf or unused upstream tensor raises (strict load, matching
    the reference's ``strict=True``).
    """
    from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter
    from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter

    if isinstance(adapter, TimesFM2p5Adapter):
        return _convert_with_rules(sd, adapter, TIMESFM_NAME_RULES)
    if isinstance(adapter, Chronos2Adapter):
        return _convert_with_rules(sd, adapter, CHRONOS_NAME_RULES)
    raise NotImplementedError(type(adapter).__name__)


# Rules: (template-path regex) -> (upstream name template, transform)
# {i} in the upstream template is the stacked-layer index. Transforms:
#   "t"  transpose last two dims (torch Linear weight -> kernel)
#   ""   as-is
TIMESFM_NAME_RULES: list[tuple[str, str, str]] = [
    (r"tokenizer/hidden/kernel", "tokenizer.hidden_layer.0.weight", "t"),
    (r"tokenizer/hidden/bias", "tokenizer.hidden_layer.0.bias", ""),
    (r"tokenizer/output/kernel", "tokenizer.output_layer.weight", "t"),
    (r"tokenizer/output/bias", "tokenizer.output_layer.bias", ""),
    (r"tokenizer/residual/kernel", "tokenizer.residual_layer.weight", "t"),
    (r"tokenizer/residual/bias", "tokenizer.residual_layer.bias", ""),
    (r"stacked_xf/attn_norm/scale", "stacked_xf.{i}.input_layernorm.weight", ""),
    (r"stacked_xf/attn/qkv/kernel", "stacked_xf.{i}.self_attn.qkv_proj.weight", "t"),
    (r"stacked_xf/attn/qkv/bias", "stacked_xf.{i}.self_attn.qkv_proj.bias", ""),
    (r"stacked_xf/attn/out/kernel", "stacked_xf.{i}.self_attn.o_proj.weight", "t"),
    (r"stacked_xf/attn/out/bias", "stacked_xf.{i}.self_attn.o_proj.bias", ""),
    (r"stacked_xf/attn/per_dim_scale", "stacked_xf.{i}.self_attn.scaling", ""),
    (r"stacked_xf/ffn_norm/scale", "stacked_xf.{i}.mlp.layer_norm.weight", ""),
    (r"stacked_xf/ffn_norm/bias", "stacked_xf.{i}.mlp.layer_norm.bias", ""),
    (r"stacked_xf/ffn_up/kernel", "stacked_xf.{i}.mlp.gate_proj.weight", "t"),
    (r"stacked_xf/ffn_up/bias", "stacked_xf.{i}.mlp.gate_proj.bias", ""),
    (r"stacked_xf/ffn_down/kernel", "stacked_xf.{i}.mlp.down_proj.weight", "t"),
    (r"stacked_xf/ffn_down/bias", "stacked_xf.{i}.mlp.down_proj.bias", ""),
    (r"output_projection_point/hidden/kernel", "output_projection_point.hidden_layer.0.weight", "t"),
    (r"output_projection_point/hidden/bias", "output_projection_point.hidden_layer.0.bias", ""),
    (r"output_projection_point/output/kernel", "output_projection_point.output_layer.weight", "t"),
    (r"output_projection_point/output/bias", "output_projection_point.output_layer.bias", ""),
    (r"output_projection_point/residual/kernel", "output_projection_point.residual_layer.weight", "t"),
    (r"output_projection_point/residual/bias", "output_projection_point.residual_layer.bias", ""),
    (r"output_projection_quantiles/hidden/kernel", "output_projection_quantiles.hidden_layer.0.weight", "t"),
    (r"output_projection_quantiles/hidden/bias", "output_projection_quantiles.hidden_layer.0.bias", ""),
    (r"output_projection_quantiles/output/kernel", "output_projection_quantiles.output_layer.weight", "t"),
    (r"output_projection_quantiles/output/bias", "output_projection_quantiles.output_layer.bias", ""),
    (r"output_projection_quantiles/residual/kernel", "output_projection_quantiles.residual_layer.weight", "t"),
    (r"output_projection_quantiles/residual/bias", "output_projection_quantiles.residual_layer.bias", ""),
]

CHRONOS_NAME_RULES: list[tuple[str, str, str]] = [
    (r"input_patch_embedding/hidden/kernel", "input_patch_embedding.hidden_layer.weight", "t"),
    (r"input_patch_embedding/hidden/bias", "input_patch_embedding.hidden_layer.bias", ""),
    (r"input_patch_embedding/output/kernel", "input_patch_embedding.output_layer.weight", "t"),
    (r"input_patch_embedding/output/bias", "input_patch_embedding.output_layer.bias", ""),
    (r"input_patch_embedding/residual/kernel", "input_patch_embedding.residual_layer.weight", "t"),
    (r"input_patch_embedding/residual/bias", "input_patch_embedding.residual_layer.bias", ""),
    (r"shared", "shared.weight", ""),
    (r"encoder/rel_pos_bias", "encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight", ""),
    (r"encoder/final_norm/scale", "encoder.final_layer_norm.weight", ""),
    (r"encoder/layers/attn_norm/scale", "encoder.block.{i}.layer.0.layer_norm.weight", ""),
    (r"encoder/layers/attn/q/kernel", "encoder.block.{i}.layer.0.SelfAttention.q.weight", "t"),
    (r"encoder/layers/attn/k/kernel", "encoder.block.{i}.layer.0.SelfAttention.k.weight", "t"),
    (r"encoder/layers/attn/v/kernel", "encoder.block.{i}.layer.0.SelfAttention.v.weight", "t"),
    (r"encoder/layers/attn/out/kernel", "encoder.block.{i}.layer.0.SelfAttention.o.weight", "t"),
    (r"encoder/layers/ffn_norm/scale", "encoder.block.{i}.layer.1.layer_norm.weight", ""),
    (r"encoder/layers/ffn_up/kernel", "encoder.block.{i}.layer.1.DenseReluDense.wi.weight", "t"),
    (r"encoder/layers/ffn_down/kernel", "encoder.block.{i}.layer.1.DenseReluDense.wo.weight", "t"),
    (r"output_patch_embedding/hidden/kernel", "output_patch_embedding.hidden_layer.weight", "t"),
    (r"output_patch_embedding/hidden/bias", "output_patch_embedding.hidden_layer.bias", ""),
    (r"output_patch_embedding/output/kernel", "output_patch_embedding.output_layer.weight", "t"),
    (r"output_patch_embedding/output/bias", "output_patch_embedding.output_layer.bias", ""),
    (r"output_patch_embedding/residual/kernel", "output_patch_embedding.residual_layer.weight", "t"),
    (r"output_patch_embedding/residual/bias", "output_patch_embedding.residual_layer.bias", ""),
]


def _convert_with_rules(
    sd: dict[str, np.ndarray], adapter: TsfmAdapter, rules: list[tuple[str, str, str]]
) -> Params:
    template = adapter.init(jax.random.key(0))
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    used: set[str] = set()
    leaves = []
    # normalization: some exports prefix names (e.g. "model.")
    prefixes = ("", "model.", "module.")

    def lookup(name: str) -> np.ndarray | None:
        for pre in prefixes:
            if pre + name in sd:
                used.add(pre + name)
                return sd[pre + name]
        return None

    unmatched: list[str] = []
    for path, leaf in flat:
        key = "/".join(
            p.key if isinstance(p, jax.tree_util.DictKey) else "" for p in path
        ).strip("/").replace("//", "/")
        rule = next((r for r in rules if re.fullmatch(r[0], key)), None)
        if rule is None:
            unmatched.append(key)
            leaves.append(leaf)
            continue
        _, name_tpl, transform = rule
        if "{i}" in name_tpl:
            # stacked per-layer leaf: gather + stack along axis 0
            num_layers = leaf.shape[0]
            per_layer = []
            for i in range(num_layers):
                arr = lookup(name_tpl.format(i=i))
                if arr is None:
                    per_layer = None
                    break
                per_layer.append(arr.T if transform == "t" else arr)
            if per_layer is None:
                unmatched.append(key)
                leaves.append(leaf)
                continue
            value = np.stack(per_layer)
        else:
            arr = lookup(name_tpl)
            if arr is None:
                unmatched.append(key)
                leaves.append(leaf)
                continue
            value = arr.T if transform == "t" else arr
        if value.shape != leaf.shape:
            raise ValueError(f"{key}: checkpoint shape {value.shape} != expected {leaf.shape}")
        leaves.append(jnp.asarray(value, leaf.dtype))

    if unmatched:
        raise ValueError(
            "Strict conversion failed; unmatched template leaves: "
            + ", ".join(unmatched[:20])
        )
    unused = set(sd) - used
    if unused:
        _logger.warning("Checkpoint tensors not consumed: %s", sorted(unused)[:20])
    return jax.tree_util.tree_unflatten(treedef, leaves)
