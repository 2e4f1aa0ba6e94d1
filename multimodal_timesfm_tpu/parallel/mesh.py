"""Device mesh construction and sharding helpers.

TPU-native replacement for the reference's device policy
(``/root/reference/src/tsfmx/utils/device.py:6-12``, cuda->mps->cpu): here the
policy is tpu->cpu, and the unit of placement is a ``jax.sharding.Mesh``
rather than a single device.

Axes:
  * ``data``  — batch dimension (pure data parallelism; gradient psum rides ICI)
  * ``model`` — optional tensor parallelism over model_dims for the large
    matmuls (tokenizer/FFN/output projections)

On a single chip the mesh is (1, 1) and all shardings degenerate to
replicated placement, so the same jitted train step runs everywhere.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Any

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"
MODEL_AXIS = "model"


@dataclasses.dataclass(frozen=True)
class MeshConfig:
    """Mesh geometry. ``data_parallel=-1`` means "all remaining devices"."""

    data_parallel: int = -1
    model_parallel: int = 1


def resolve_platform(platform: str | None = None) -> str:
    """Pick the compute platform: explicit override, else tpu if present, else cpu."""
    if platform is not None:
        return platform
    try:
        return jax.devices()[0].platform
    except RuntimeError:
        return "cpu"


def make_mesh(config: MeshConfig | None = None, devices: list[jax.Device] | None = None) -> Mesh:
    """Build a 2-D (data, model) mesh over the available devices.

    Model-parallel groups are laid out over adjacent devices so that the
    all-reduces inside a model-sharded matmul ride the fastest ICI links.
    """
    config = config or MeshConfig()
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    mp = config.model_parallel
    if mp < 1:
        raise ValueError(f"model_parallel must be >= 1, got {mp}")
    dp = config.data_parallel if config.data_parallel > 0 else n // mp
    if dp < 1 or dp * mp != n:
        raise ValueError(f"mesh ({dp} data x {mp} model) does not match {n} devices")
    dev_array = np.asarray(devices).reshape(dp, mp)
    return Mesh(dev_array, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Sharding for a batch-leading array: shard dim 0 over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated sharding (params, scalars)."""
    return NamedSharding(mesh, P())


def pad_to_multiple(n: int, m: int) -> int:
    """Round ``n`` up to a multiple of ``m`` (for batch padding before sharding)."""
    return int(math.ceil(n / m) * m)


def put_global(x: Any, sharding: NamedSharding) -> jax.Array:
    """``device_put`` that also works on multi-process (multi-host) meshes.

    ``jax.device_put`` requires every device in the sharding to be
    addressable, so on a multi-host slice host-local numpy arrays must go
    through ``make_array_from_process_local_data`` instead. Our loaders
    build the FULL array on every host, so the explicit ``global_shape``
    tells JAX each process holds a complete copy and only its addressable
    shards are sliced out — this covers both replicated and data-sharded
    staging. Single-process (the tested path) is a plain ``device_put``.
    """
    if jax.process_count() == 1:
        return jax.device_put(x, sharding)
    arr = np.asarray(x)
    return jax.make_array_from_process_local_data(sharding, arr, arr.shape)


def shard_batch(mesh: Mesh, tree: Any) -> Any:
    """Place a pytree of batch-leading host arrays onto the mesh, data-sharded.

    Batch dims must already be divisible by the data-axis size (the trainer
    pads with masked samples before calling this).
    """
    sharding = batch_sharding(mesh)
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)
