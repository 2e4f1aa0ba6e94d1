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


def _load_torch_bin(path: Path) -> dict[str, np.ndarray]:
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    # numpy has no bf16: .numpy() raises on bf16 checkpoints (common for
    # modern exports). Upcast to fp32 — conversion casts to the template
    # dtype anyway, and bf16->fp32 is exact.
    return {
        k: (v.float().numpy() if v.dtype == torch.bfloat16 else v.numpy())
        for k, v in sd.items()
    }


def load_backbone_checkpoint(path: Path, adapter: TsfmAdapter) -> Params:
    """Load backbone params from a local checkpoint directory or file.

    Accepts every layout ``snapshot.resolve_snapshot_dir`` resolves:
    ``model.safetensors`` or ``pytorch_model.bin`` HF snapshots (the resolver
    prefers revisions carrying either), plus this framework's ``.ckpt``/
    ``.pkl`` pickles of a params pytree.
    """
    path = Path(path)
    if path.is_dir():
        st = path / "model.safetensors"
        if st.exists():
            return convert_safetensors(_load_safetensors(st), adapter)
        bin_path = path / "pytorch_model.bin"
        if bin_path.exists():
            return convert_safetensors(_load_torch_bin(bin_path), adapter)
        candidates = sorted(path.glob("*.ckpt")) + sorted(path.glob("*.pkl"))
        if candidates:
            if len(candidates) > 1:
                _logger.warning(
                    "Multiple checkpoints under %s; loading %s (lexicographically "
                    "first — pass the file path directly to pick another)",
                    path,
                    candidates[0].name,
                )
            path = candidates[0]
        else:
            raise FileNotFoundError(
                f"No model.safetensors, pytorch_model.bin, or .ckpt/.pkl under {path}"
            )
    if path.suffix == ".safetensors":
        return convert_safetensors(_load_safetensors(path), adapter)
    if path.suffix == ".bin":
        return convert_safetensors(_load_torch_bin(path), adapter)
    with open(path, "rb") as f:
        payload = pickle.load(f)
    if isinstance(payload, dict) and "adapter_params" not in payload and (
        "fusion_params" in payload or "optimizer_state" in payload
    ):
        raise ValueError(
            f"{path} is a training checkpoint without backbone weights "
            "(multimodal mode saves fusion_params only) — point at a baseline "
            "checkpoint carrying adapter_params, or at a pretrained snapshot."
        )
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


# Rules: (template-path regex) -> list of upstream-name candidates, tried in
# order: (name template, transform). {i} is the stacked-layer index; {p} in a
# "split" transform expands to q/k/v. Transforms:
#   "t"      transpose last two dims (torch Linear weight -> kernel)
#   ""       as-is
#   "rms"    RMSNorm scale with convention auto-detection: torch RMSNorms
#            that store ``weight`` overwhelmingly compute ``weight * normed``
#            (T5/LLaMA/HF-TimesFM), while the PAX lineage stores a zero-
#            centered ``scale`` and computes ``(1 + scale) * normed`` (ours).
#            A REAL checkpoint disambiguates by statistics: weight-convention
#            tensors cluster around 1, scale-convention around 0 — if the
#            mean exceeds 0.5 we subtract 1 (logged).
#   "split_t"/"split_b"  gather separate {p}_proj q/k/v Linear weights/biases
#            and concatenate into our fused qkv layout (out-dim order q;k;v,
#            matching the (3, heads, head_dim) reshape in models/layers.py).
# Inner ResidualBlock layer-name candidates cover both guessed ("hidden_layer
# .0") and the HF-TimesFM-lineage names (input_layer/output_layer/
# residual_layer — transformers/models/timesfm/modeling_timesfm.py, verified
# wiring oracle in tests/test_hf_timesfm_oracle.py).


def _residual_block_rules(
    ours: str,
    theirs: str,
    hidden: tuple[str, ...] = ("hidden_layer.0", "input_layer", "hidden_layer"),
) -> list[tuple[str, list[tuple[str, str]]]]:
    """Rules for one upstream ResidualBlock; ``hidden`` orders the inner-layer
    name candidates (all are tried, order only sets precedence when multiple
    aliases coexist in one checkpoint)."""

    def cands(inner, suffix: str, transform: str):
        return [(f"{theirs}.{n}.{suffix}", transform) for n in inner]

    return [
        (rf"{ours}/hidden/kernel", cands(hidden, "weight", "t")),
        (rf"{ours}/hidden/bias", cands(hidden, "bias", "")),
        (rf"{ours}/output/kernel", cands(["output_layer"], "weight", "t")),
        (rf"{ours}/output/bias", cands(["output_layer"], "bias", "")),
        (rf"{ours}/residual/kernel", cands(["residual_layer"], "weight", "t")),
        (rf"{ours}/residual/bias", cands(["residual_layer"], "bias", "")),
    ]


TIMESFM_NAME_RULES: list[tuple[str, list[tuple[str, str]]]] = [
    *_residual_block_rules("tokenizer", "tokenizer"),
    (r"stacked_xf/attn_norm/scale", [("stacked_xf.{i}.input_layernorm.weight", "rms")]),
    (
        r"stacked_xf/attn/qkv/kernel",
        [
            ("stacked_xf.{i}.self_attn.qkv_proj.weight", "t"),
            ("stacked_xf.{i}.self_attn.{p}_proj.weight", "split_t"),
        ],
    ),
    (
        r"stacked_xf/attn/qkv/bias",
        [
            ("stacked_xf.{i}.self_attn.qkv_proj.bias", ""),
            ("stacked_xf.{i}.self_attn.{p}_proj.bias", "split_b"),
        ],
    ),
    (r"stacked_xf/attn/out/kernel", [("stacked_xf.{i}.self_attn.o_proj.weight", "t")]),
    (r"stacked_xf/attn/out/bias", [("stacked_xf.{i}.self_attn.o_proj.bias", "")]),
    (r"stacked_xf/attn/per_dim_scale", [("stacked_xf.{i}.self_attn.scaling", "")]),
    (r"stacked_xf/ffn_norm/scale", [("stacked_xf.{i}.mlp.layer_norm.weight", "")]),
    (r"stacked_xf/ffn_norm/bias", [("stacked_xf.{i}.mlp.layer_norm.bias", "")]),
    (r"stacked_xf/ffn_up/kernel", [("stacked_xf.{i}.mlp.gate_proj.weight", "t")]),
    (r"stacked_xf/ffn_up/bias", [("stacked_xf.{i}.mlp.gate_proj.bias", "")]),
    (r"stacked_xf/ffn_down/kernel", [("stacked_xf.{i}.mlp.down_proj.weight", "t")]),
    (r"stacked_xf/ffn_down/bias", [("stacked_xf.{i}.mlp.down_proj.bias", "")]),
    *_residual_block_rules("output_projection_point", "output_projection_point"),
    *_residual_block_rules("output_projection_quantiles", "output_projection_quantiles"),
]

# Chronos checkpoints favor the plain "hidden_layer" alias first.
_CHRONOS_HIDDEN = ("hidden_layer", "input_layer", "hidden_layer.0")

CHRONOS_NAME_RULES: list[tuple[str, list[tuple[str, str]]]] = [
    *_residual_block_rules("input_patch_embedding", "input_patch_embedding", _CHRONOS_HIDDEN),
    (r"shared", [("shared.weight", "")]),
    (
        r"encoder/rel_pos_bias",
        [("encoder.block.0.layer.0.SelfAttention.relative_attention_bias.weight", "")],
    ),
    # T5-style RMSNorms: upstream stores ``weight`` (weight-convention);
    # our rms_norm applies (1 + scale) — "rms" auto-detects and shifts.
    (r"encoder/final_norm/scale", [("encoder.final_layer_norm.weight", "rms")]),
    (r"encoder/layers/attn_norm/scale", [("encoder.block.{i}.layer.0.layer_norm.weight", "rms")]),
    (r"encoder/layers/attn/q/kernel", [("encoder.block.{i}.layer.0.SelfAttention.q.weight", "t")]),
    (r"encoder/layers/attn/k/kernel", [("encoder.block.{i}.layer.0.SelfAttention.k.weight", "t")]),
    (r"encoder/layers/attn/v/kernel", [("encoder.block.{i}.layer.0.SelfAttention.v.weight", "t")]),
    (r"encoder/layers/attn/out/kernel", [("encoder.block.{i}.layer.0.SelfAttention.o.weight", "t")]),
    (r"encoder/layers/ffn_norm/scale", [("encoder.block.{i}.layer.1.layer_norm.weight", "rms")]),
    (r"encoder/layers/ffn_up/kernel", [("encoder.block.{i}.layer.1.DenseReluDense.wi.weight", "t")]),
    (r"encoder/layers/ffn_down/kernel", [("encoder.block.{i}.layer.1.DenseReluDense.wo.weight", "t")]),
    *_residual_block_rules("output_patch_embedding", "output_patch_embedding", _CHRONOS_HIDDEN),
]


def _convert_with_rules(
    sd: dict[str, np.ndarray],
    adapter: TsfmAdapter,
    rules: list[tuple[str, list[tuple[str, str]]]],
) -> Params:
    template = adapter.init(jax.random.key(0))
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    used: set[str] = set()
    leaves = []
    # normalization: some exports prefix names (e.g. "model.")
    prefixes = ("", "model.", "module.")

    def lookup(name: str, attempt: set[str]) -> np.ndarray | None:
        for pre in prefixes:
            if pre + name in sd:
                attempt.add(pre + name)
                return sd[pre + name]
        return None

    def fetch(name_tpl: str, transform: str, i: int | None, attempt: set[str]) -> np.ndarray | None:
        """Resolve ONE candidate (for layer i when templated), transformed."""
        fmt = {"i": i} if i is not None else {}
        if transform.startswith("split_"):
            parts = [lookup(name_tpl.format(p=p, **fmt), attempt) for p in ("q", "k", "v")]
            if any(p is None for p in parts):
                return None
            if transform == "split_t":  # (out,in) weights -> fused (in, 3*out)
                return np.concatenate([p.T for p in parts], axis=1)
            return np.concatenate(parts, axis=0)  # split_b: fused bias
        arr = lookup(name_tpl.format(**fmt), attempt)
        if arr is None:
            return None
        if transform == "t":
            return arr.T
        if transform == "rms":
            # Convention auto-detection (see the rules comment): real
            # weight-convention RMSNorm tensors cluster around +1, PAX-style
            # zero-centered scales around 0. Only a POSITIVE mean indicates
            # the weight convention — a strongly negative mean can only be a
            # (drifted) zero-centered scale, and subtracting 1 from it would
            # silently invert activations.
            if float(np.mean(arr)) > 0.5:
                _logger.info(
                    "RMSNorm %s: weight-convention detected (mean %.3f); storing weight - 1",
                    name_tpl.format(**fmt),
                    float(np.mean(arr)),
                )
                return arr - 1.0
            return arr
        return arr

    def resolve(candidates: list[tuple[str, str]], leaf) -> np.ndarray | None:
        for name_tpl, transform in candidates:
            # Tensors consumed by a candidate count as "used" only if the
            # WHOLE candidate succeeds — a partial match that falls through
            # to the next candidate must not suppress the unconsumed-tensor
            # warning for the names it touched.
            attempt: set[str] = set()
            if "{i}" in name_tpl:
                per_layer = [fetch(name_tpl, transform, i, attempt) for i in range(leaf.shape[0])]
                if all(p is not None for p in per_layer):
                    used.update(attempt)
                    return np.stack(per_layer)
            else:
                value = fetch(name_tpl, transform, None, attempt)
                if value is not None:
                    used.update(attempt)
                    return value
        return None

    unmatched: list[str] = []
    for path, leaf in flat:
        key = "/".join(
            p.key if isinstance(p, jax.tree_util.DictKey) else "" for p in path
        ).strip("/").replace("//", "/")
        rule = next((r for r in rules if re.fullmatch(r[0], key)), None)
        value = resolve(rule[1], leaf) if rule is not None else None
        if value is None:
            unmatched.append(key)
            leaves.append(leaf)
            continue
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
