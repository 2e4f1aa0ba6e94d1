"""Serving exports: TF SavedModel and pure-JAX StableHLO artifacts.

Production-serving surface the reference lacks entirely. Two formats:

* :func:`export_saved_model` — the jitted forecast pipeline (preprocess ->
  fusion -> backbone -> postprocess) as a TF SavedModel via
  ``orbax.export``/jax2tf with a polymorphic batch dimension, for TF
  Serving / Vertex / tflite-convertible runtimes with no JAX on the serving
  side. Requires ``tensorflow`` + ``orbax-export`` (optional extras).
* :func:`export_stablehlo` / :func:`load_stablehlo` — the same pipeline as a
  portable ``jax.export`` StableHLO artifact (weights alongside), loadable
  by any JAX process on any lowered-for platform with NO framework or model
  Python code — only jax itself. This is the TPU-native serving format: the
  serialized module is exactly what XLA compiles, so there is no TF interop
  layer and no dependency beyond jax.

Parity with the in-process JAX forward is tested to fp32 round-off
(``tests/test_serving_export.py``).
"""

from __future__ import annotations

from typing import Any

import json
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from multimodal_timesfm_tpu.models.base import Params
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder
from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()


def export_saved_model(
    decoder: MultimodalDecoder,
    params: Params,
    horizon: int,
    context_len: int,
    output_dir: str | Path,
    multimodal: bool = False,
    full_outputs: bool = False,
) -> Path:
    """Export the forecast pipeline as a TF SavedModel.

    Args:
        horizon: forecast steps baked into the served graph.
        context_len: static context length (must be a multiple of patch_len).
        multimodal: include a ``text_embeddings`` input fused into the patch
            stream (shape ``(b, context_len / patch_len, text_dims)``).
        full_outputs: also emit ``full_forecast`` (B, horizon, num_channels)
            alongside ``point_forecast`` (B, horizon).

    Returns:
        The SavedModel directory. Serving signature ``serving_default`` with
        named inputs ``context`` (+ ``text_embeddings``); padding masks are
        all-valid, matching the trainer/evaluator convention for served
        windows.
    """
    import tensorflow as tf
    from orbax.export import ExportManager, JaxModule, ServingConfig

    num_patches = context_len // decoder.adapter.patch_len
    text_dims = decoder.fusion_spec.text_embedding_dims

    def apply_fn(p, inputs):
        context = inputs["context"]
        masks = jnp.zeros_like(context, dtype=bool)
        text = inputs.get("text_embeddings")
        out = {"point_forecast": decoder(p, horizon, context, masks, text)}
        if full_outputs:
            out["full_forecast"] = decoder.forward_full(p, horizon, context, masks, text)
        return out

    poly = {"context": f"(b, {context_len})"}
    signature = {"context": tf.TensorSpec([None, context_len], tf.float32, "context")}
    if multimodal:
        poly["text_embeddings"] = f"(b, {num_patches}, {text_dims})"
        signature["text_embeddings"] = tf.TensorSpec(
            [None, num_patches, text_dims], tf.float32, "text_embeddings"
        )

    from multimodal_timesfm_tpu.ops.attention import force_xla_attention

    # Serialize for both CPU and TPU serving runtimes — without this the
    # artifact embeds only the platform the export PROCESS ran on (e.g. a
    # TPU-host export would refuse to serve on CPU). Pallas custom calls are
    # not portable across those platforms, so the whole trace-and-lower span
    # runs under force_xla_attention (the artifact embeds the XLA attention
    # on every lowering; O(S^2) caveat documented on that context manager).
    with force_xla_attention():
        module = JaxModule(
            params,
            apply_fn,
            trainable=False,
            input_polymorphic_shape=poly,
            jax2tf_kwargs={"native_serialization_platforms": ("cpu", "tpu")},
        )
        manager = ExportManager(
            module, [ServingConfig("serving_default", input_signature=[signature])]
        )
        output_dir = Path(output_dir)
        manager.save(str(output_dir))
    _logger.info(
        "Exported SavedModel to %s (horizon=%d, context=%d, multimodal=%s, full=%s)",
        output_dir,
        horizon,
        context_len,
        multimodal,
        full_outputs,
    )
    return output_dir


_STABLEHLO_FILE = "forecast.stablehlo"
_PARAMS_FILE = "params.npz"
_MANIFEST_FILE = "manifest.json"


def _flatten_params(params: Params, with_bytes: bool = True) -> tuple[dict, dict, dict]:
    """Flatten a dict/list pytree of arrays into npz-safe flat leaves.

    Returns ``(leaves, leaf_spec, list_lens)``: raw-byte views keyed by
    "/"-joined paths, per-leaf shape/dtype, and the lengths of list-valued
    containers (so the exact structure round-trips). Byte views rather than
    the arrays themselves because ``np.savez`` silently degrades non-native
    dtypes (bf16 -> void). No pickle anywhere: a serving host can load an
    artifact from an untrusted source without executing code.

    Containers that would NOT survive the round-trip are refused loudly
    (review finding): the exported module is traced with the ORIGINAL pytree,
    so a tuple (reconstructed as a list), a non-string dict key
    (reconstructed as a string), or an empty container (dropped entirely)
    would export cleanly and then fail every ``serve_fn`` call with an opaque
    input-pytree mismatch.
    """
    leaves: dict[str, np.ndarray] = {}
    leaf_spec: dict[str, dict] = {}
    list_lens: dict[str, int] = {}

    def walk(prefix: tuple[str, ...], node) -> None:
        path = "/".join(prefix) or "<root>"
        if isinstance(node, dict):
            if not node:
                raise ValueError(
                    f"param subtree {path!r} is an empty dict: it cannot survive "
                    "the npz round-trip (dropped on load) — prune it before exporting"
                )
            for k, v in node.items():
                if not isinstance(k, str):
                    raise ValueError(
                        f"param key {k!r} under {path!r} is not a string: it would "
                        "round-trip as a string key — convert before exporting"
                    )
                if "/" in k:
                    raise ValueError(f"param key {k!r} contains '/'")
                walk(prefix + (k,), v)
        elif isinstance(node, (list, tuple)):
            if isinstance(node, tuple):
                raise ValueError(
                    f"param subtree {path!r} is a tuple: it would round-trip as a "
                    "list (different pytree structure than the exported module was "
                    "traced with) — convert to a list before exporting"
                )
            if not node:
                raise ValueError(
                    f"param subtree {path!r} is an empty list: it cannot survive "
                    "the npz round-trip (dropped on load) — prune it before exporting"
                )
            list_lens["/".join(prefix)] = len(node)
            for i, v in enumerate(node):
                walk(prefix + (str(i),), v)
        else:
            name = "/".join(prefix)
            if with_bytes:
                arr = np.asarray(node)
                leaves[name] = np.frombuffer(arr.tobytes(), np.uint8)
                leaf_spec[name] = {"shape": list(arr.shape), "dtype": str(arr.dtype)}
            else:
                # spec-only pass (validation before an expensive trace): no
                # host byte copies of the full param set are materialized.
                leaf_spec[name] = {
                    "shape": list(jnp.shape(node)),
                    "dtype": str(np.dtype(getattr(node, "dtype", None) or np.result_type(node))),
                }

    walk((), params)
    return leaves, leaf_spec, list_lens


def _write_npz_atomic(path: Path, leaves: dict) -> None:
    """Write ``leaves`` to ``path`` via a same-directory temp file + rename.

    ``np.savez`` straight onto the target would leave a truncated archive —
    and destroy the previous valid weights — if the process dies or the disk
    fills mid-write. The temp file is opened explicitly because ``np.savez``
    appends ``.npz`` to string paths that lack the suffix.
    """
    tmp = path.with_name(path.name + ".tmp")
    try:
        with open(tmp, "wb") as f:
            np.savez(f, **leaves)
        tmp.replace(path)
    finally:
        tmp.unlink(missing_ok=True)


def _unflatten_params(npz: Any, leaf_spec: dict, list_lens: dict) -> dict:
    """Inverse of :func:`_flatten_params` (lists come back as lists)."""
    root: dict = {}
    for name, meta in leaf_spec.items():
        arr = np.frombuffer(npz[name].tobytes(), dtype=np.dtype(meta["dtype"]))
        arr = arr.reshape(meta["shape"])
        node = root
        parts = name.split("/")
        for part in parts[:-1]:
            node = node.setdefault(part, {})
        node[parts[-1]] = arr

    def listify(prefix: tuple[str, ...], node):
        if not isinstance(node, dict):
            return node
        out = {k: listify(prefix + (k,), v) for k, v in node.items()}
        path = "/".join(prefix)
        if path in list_lens:
            return [out[str(i)] for i in range(list_lens[path])]
        return out

    return listify((), root)


def save_stablehlo_params(artifact_dir: str | Path, params: Params) -> None:
    """Re-point an exported artifact at new weights (e.g. after a fine-tune).

    Rewrites ``params.npz`` without touching the lowered module. The new
    tree is validated against the manifest's recorded leaf spec BEFORE
    anything is written: the module was lowered for exactly those
    shapes/dtypes, so a mismatched re-point (bf16-cast weights, different
    fusion depth) would corrupt the artifact in place and only surface as an
    opaque aval mismatch on the serving host.
    """
    artifact_dir = Path(artifact_dir)
    leaves, leaf_spec, list_lens = _flatten_params(params)
    manifest = json.loads((artifact_dir / _MANIFEST_FILE).read_text())
    old_spec, old_lens = manifest["leaf_spec"], manifest["list_lens"]
    if leaf_spec != old_spec or list_lens != old_lens:
        missing = sorted(set(old_spec) - set(leaf_spec))
        extra = sorted(set(leaf_spec) - set(old_spec))
        changed = sorted(
            k for k in set(leaf_spec) & set(old_spec) if leaf_spec[k] != old_spec[k]
        )
        detail = "; ".join(
            f"{label}: {names[:5]}{'...' if len(names) > 5 else ''}"
            for label, names in (
                ("missing leaves", missing),
                ("unexpected leaves", extra),
                ("shape/dtype mismatches", changed),
            )
            if names
        ) or "list-structure mismatch"
        raise ValueError(
            f"params do not match the exported module's spec ({detail}). The "
            "StableHLO module was lowered for the exported shapes/dtypes — "
            "re-export with export_stablehlo instead of re-pointing."
        )
    _write_npz_atomic(artifact_dir / _PARAMS_FILE, leaves)


def export_stablehlo(
    decoder: MultimodalDecoder,
    params: Params,
    horizon: int,
    context_len: int,
    output_dir: str | Path,
    multimodal: bool = False,
    full_outputs: bool = False,
    platforms: tuple[str, ...] = ("cpu", "tpu"),
) -> Path:
    """Export the forecast pipeline as a portable ``jax.export`` artifact.

    The artifact directory contains the serialized StableHLO module
    (symbolic batch dimension, lowered for every platform in ``platforms``),
    the weights as a pickle-free npz (raw-byte leaves + manifest spec, so
    untrusted artifacts never execute code on load), and a JSON manifest
    with the serving geometry. :func:`load_stablehlo` reconstructs a
    callable from it without importing any model code — the compute graph is
    baked into the module, exactly as XLA will compile it.

    Weights travel OUTSIDE the module (as a call argument) rather than as
    baked-in constants: embedded 200M-parameter constants bloat the program
    and are rejected by remote-compile deployments (see CLAUDE.md), and
    :func:`save_stablehlo_params` lets a fine-tune update the artifact
    without re-lowering.

    Attention portability: tracing runs under
    ``ops.attention.force_xla_attention`` — Pallas TPU custom calls cannot
    appear in a multi-platform module, so every lowering embeds the XLA
    attention path. Contexts beyond 2048 patch tokens (where the tiled flash
    kernels exist to avoid XLA's O(S^2) logits) should be served in-process
    via ``inference.Forecaster`` instead.

    Args / returns mirror :func:`export_saved_model`.
    """
    from jax import export as jax_export

    num_patches = context_len // decoder.adapter.patch_len
    text_dims = decoder.fusion_spec.text_embedding_dims

    if multimodal:

        def apply_fn(p, context, text_embeddings):
            masks = jnp.zeros_like(context, dtype=bool)
            out = {"point_forecast": decoder(p, horizon, context, masks, text_embeddings)}
            if full_outputs:
                out["full_forecast"] = decoder.forward_full(
                    p, horizon, context, masks, text_embeddings
                )
            return out

    else:

        def apply_fn(p, context):
            masks = jnp.zeros_like(context, dtype=bool)
            out = {"point_forecast": decoder(p, horizon, context, masks, None)}
            if full_outputs:
                out["full_forecast"] = decoder.forward_full(p, horizon, context, masks, None)
            return out

    from multimodal_timesfm_tpu.ops.attention import force_xla_attention

    # .dtype via numpy metadata only — jnp.asarray here would round-trip
    # every leaf through the device just to read its dtype.
    param_specs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(jnp.shape(x), np.dtype(getattr(x, "dtype", None) or np.result_type(x))),
        params,
    )
    # Validate the tree's structure (refusing lossy containers) BEFORE the
    # expensive trace — spec-only, so no raw-byte copy of the full param set
    # is held through the minutes-long lowering; bytes are extracted after.
    _flatten_params(params, with_bytes=False)

    (b,) = jax_export.symbolic_shape("b")
    specs = [param_specs, jax.ShapeDtypeStruct((b, context_len), jnp.float32)]
    if multimodal:
        specs.append(jax.ShapeDtypeStruct((b, num_patches, text_dims), jnp.float32))
    with force_xla_attention():
        exported = jax_export.export(jax.jit(apply_fn), platforms=list(platforms))(*specs)

    output_dir = Path(output_dir)
    output_dir.mkdir(parents=True, exist_ok=True)
    (output_dir / _STABLEHLO_FILE).write_bytes(exported.serialize())
    leaves, leaf_spec, list_lens = _flatten_params(params)
    _write_npz_atomic(output_dir / _PARAMS_FILE, leaves)
    (output_dir / _MANIFEST_FILE).write_text(json.dumps({
        "format": "jax.export.stablehlo",
        "horizon": horizon,
        "context_len": context_len,
        "num_patches": num_patches,
        "text_dims": text_dims,
        "multimodal": multimodal,
        "full_outputs": full_outputs,
        "platforms": list(platforms),
        "leaf_spec": leaf_spec,
        "list_lens": list_lens,
    }, indent=2))
    _logger.info(
        "Exported StableHLO artifact to %s (horizon=%d, context=%d, multimodal=%s, "
        "full=%s, platforms=%s)",
        output_dir, horizon, context_len, multimodal, full_outputs, list(platforms),
    )
    return output_dir


def load_stablehlo(artifact_dir: str | Path) -> Any:
    """Load a :func:`export_stablehlo` artifact into a serving callable.

    Needs only jax — no model code, no framework import, and no pickle
    (artifacts from untrusted sources never execute code). Returns
    ``(serve_fn, manifest)`` where ``serve_fn(context[, text_embeddings])``
    returns the exported output dict; the batch dimension is free.

    The weights are ``jax.device_put`` once at load — each call reuses the
    resident buffers instead of re-uploading the full parameter set per
    request. Do NOT wrap ``serve_fn`` in another ``jax.jit`` that closes
    over it: the params would bake into the traced program as constants
    (CLAUDE.md's remote-compile payload pitfall); ``exported.call`` already
    executes the pre-lowered module.
    """
    from jax import export as jax_export

    artifact_dir = Path(artifact_dir)
    exported = jax_export.deserialize((artifact_dir / _STABLEHLO_FILE).read_bytes())
    manifest = json.loads((artifact_dir / _MANIFEST_FILE).read_text())
    with np.load(artifact_dir / _PARAMS_FILE, allow_pickle=False) as npz:
        params = _unflatten_params(npz, manifest["leaf_spec"], manifest["list_lens"])
    params = jax.device_put(params)

    if manifest["multimodal"]:

        def serve_fn(context, text_embeddings):
            return exported.call(params, context, text_embeddings)

    else:

        def serve_fn(context):
            return exported.call(params, context)

    return serve_fn, manifest
