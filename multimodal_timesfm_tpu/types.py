"""Shared data schemas flowing between layers.

Capability parity with the reference's TypedDict schemas
(``/root/reference/src/tsfmx/types.py:12-68``), re-expressed for a JAX
framework: batches are plain dicts of ``numpy``/``jax`` arrays so they are
pytrees and can be donated/sharded directly.

The ``text_embeddings`` key is optional — its presence toggles multimodal vs
baseline behavior downstream, exactly like the reference
(``types.py:29,38``).
"""

from __future__ import annotations

from typing import Any, Literal, NotRequired, TypedDict

import numpy as np
import numpy.typing as npt

TrainingMode = Literal["multimodal", "baseline"]


class RawSample(TypedDict):
    """A single raw dataset sample before preprocessing.

    Parity: reference ``types.py:15-22``.
    """

    context: npt.NDArray[np.float32]
    horizon: npt.NDArray[np.float32]
    patched_texts: list[list[str]]
    metadata: dict[str, Any]


class PreprocessedSample(TypedDict):
    """A single dataset sample after preprocessing (text already embedded).

    Parity: reference ``types.py:24-31``.
    """

    context: npt.NDArray[np.float32]
    horizon: npt.NDArray[np.float32]
    text_embeddings: NotRequired[npt.NDArray[np.float32]]
    metadata: dict[str, Any]


class Batch(TypedDict):
    """A collated batch. Arrays may be numpy (host) or jax (device).

    Parity: reference ``types.py:33-40``. Unlike the reference, arrays here
    are backend-agnostic; the trainer shards them over the mesh's data axis.
    """

    context: Any
    horizon: Any
    text_embeddings: NotRequired[Any]
    metadata: list[dict[str, Any]]


class CheckpointBase(TypedDict):
    """Base fields shared by all checkpoint types (reference ``types.py:42-50``)."""

    epoch: int
    global_step: int
    optimizer_state: Any
    best_val_loss: float


class MultimodalCheckpoint(CheckpointBase):
    """Checkpoint for multimodal mode: fusion params only (reference ``types.py:53-56``)."""

    fusion_params: Any


class BaselineCheckpoint(CheckpointBase):
    """Checkpoint for baseline mode: adapter params only (reference ``types.py:59-61``)."""

    adapter_params: Any


class EvaluationMetrics(TypedDict):
    """Evaluation metrics (reference ``types.py:64-68``).

    ``wql``/``mean_pinball`` are extensions over the reference's MSE/MAE-only
    surface, present when the evaluator is asked for quantile metrics
    (``MultimodalEvaluator.evaluate(quantile_metrics=True)``).
    """

    mse: float
    mae: float
    wql: NotRequired[float]
    mean_pinball: NotRequired[float]
