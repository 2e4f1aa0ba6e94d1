"""SavedModel export for serving.

Production-serving surface the reference lacks entirely: the jitted forecast
pipeline (preprocess -> fusion -> backbone -> postprocess) is exported as a
TF SavedModel via ``orbax.export``/jax2tf with a polymorphic batch dimension,
so the same artifact serves any batch size from TF Serving / Vertex /
tflite-convertible runtimes, with no JAX (or Python model code) on the
serving side. Parity with the in-process JAX forward is tested to fp32
round-off (``tests/test_serving_export.py``).

Requires ``tensorflow`` and ``orbax-export`` (both optional extras).
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp

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

    # Serialize for both CPU and TPU serving runtimes — without this the
    # artifact embeds only the platform the export PROCESS ran on (e.g. a
    # TPU-host export would refuse to serve on CPU).
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
