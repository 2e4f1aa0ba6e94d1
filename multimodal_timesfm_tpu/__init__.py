"""multimodal_timesfm_tpu — TPU-native multimodal time-series foundation model framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of TSFMx
(reference: /root/reference, himura467/multimodal-timesfm): fine-tuning
pretrained time-series foundation models (TimesFM 2.5, Chronos-2) with
multimodal text inputs fused into the patch-embedding stream.

Design stance (TPU-first, not a torch port):
  * Models are pure functions over parameter pytrees; no mutable modules.
  * The train step is a single jit-compiled function (forward + loss + grad +
    optimizer update), sharded over a ``jax.sharding.Mesh``.
  * Sequential per-patch statistics become ``lax.scan``; transformer stacks
    are scanned and the attention inner loop has a Pallas kernel path.
  * Host<->device traffic is minimized: datasets are staged to device once,
    batches are device-side gathers.
"""

__version__ = "0.1.0"

from multimodal_timesfm_tpu.types import (  # noqa: F401
    Batch,
    EvaluationMetrics,
    PreprocessedSample,
    RawSample,
    TrainingMode,
)
