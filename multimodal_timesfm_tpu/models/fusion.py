"""Addition-based multimodal fusion MLP.

Parity: reference ``MultimodalFusion``
(``/root/reference/src/tsfmx/fusion.py:7-55``): a 1-3 layer bias-free
Linear+ReLU MLP projecting text embedding dims -> ts embedding dims, added
element-wise to the patch embeddings. Xavier-uniform init, bias omitted
(reference ``fusion.py:28``: "deemed unnecessary by W&B Sweeps").
"""

from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp

from multimodal_timesfm_tpu.models.base import Params
from multimodal_timesfm_tpu.models.layers import relu, xavier_uniform


@dataclasses.dataclass(frozen=True)
class FusionSpec:
    """Fusion MLP geometry.

    Raises (at construction): ValueError for num_layers outside 1..3 or a
    hidden_dims length mismatch — same guards as reference ``fusion.py:36-42``.
    """

    ts_embedding_dims: int
    text_embedding_dims: int
    num_layers: int = 1
    hidden_dims: tuple[int, ...] = ()

    def __post_init__(self) -> None:
        if self.num_layers < 1 or self.num_layers > 3:
            raise ValueError(f"num_layers must be between 1 and 3, got {self.num_layers}")
        if len(self.hidden_dims) != self.num_layers - 1:
            raise ValueError(
                f"hidden_dims must have {self.num_layers - 1} elements for "
                f"{self.num_layers} layers, got {len(self.hidden_dims)}"
            )

    @property
    def dims(self) -> tuple[int, ...]:
        return (self.text_embedding_dims, *self.hidden_dims, self.ts_embedding_dims)


def init_fusion(rng: jax.Array, spec: FusionSpec) -> Params:
    dims = spec.dims
    keys = jax.random.split(rng, len(dims) - 1)
    return {
        "layers": [
            {"kernel": xavier_uniform(k, (dims[i], dims[i + 1]))} for i, k in enumerate(keys)
        ]
    }


def apply_fusion(params: Params, ts_embeddings: jax.Array, text_embeddings: jax.Array) -> jax.Array:
    """Project text embeddings through Linear(bias-free)+ReLU layers, add to ts embeddings."""
    h = text_embeddings.astype(ts_embeddings.dtype)
    for layer in params["layers"]:
        # layers.relu saves only its output as the backward residual.
        h = relu(jnp.dot(h, layer["kernel"], preferred_element_type=jnp.float32).astype(h.dtype))
    return ts_embeddings + h
