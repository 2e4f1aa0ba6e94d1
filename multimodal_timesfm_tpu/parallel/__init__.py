"""Parallelism layer: device mesh construction and sharding rules.

Replaces the reference's single-device ``utils/device.py``
(``/root/reference/src/tsfmx/utils/device.py:6-27``) with a
``jax.sharding.Mesh`` abstraction. The reference has no distributed layer at
all (SURVEY.md §2.4); here scale-out is first-class: batches shard over the
``data`` axis, large matmul weights optionally shard over the ``model`` axis,
and XLA inserts the collectives (psum for grad all-reduce) implied by the
shardings.
"""

from multimodal_timesfm_tpu.parallel.distributed import initialize_multihost  # noqa: F401
from multimodal_timesfm_tpu.parallel.mesh import (  # noqa: F401
    MeshConfig,
    batch_sharding,
    make_mesh,
    replicated,
    resolve_platform,
    shard_batch,
)
from multimodal_timesfm_tpu.parallel.sharding import param_specs, shard_params  # noqa: F401
