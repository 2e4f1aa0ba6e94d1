"""Multi-host initialization (DCN) helpers.

The reference is strictly single-process (SURVEY.md §2.4). For multi-host
TPU slices, JAX needs one ``jax.distributed.initialize`` call per host before
any backend use; after that, ``make_mesh`` over ``jax.devices()`` spans the
slice and the same sharded train step runs: the trainer stages host arrays
via ``parallel.mesh.put_global``, which routes through
``make_array_from_process_local_data`` when ``jax.process_count() > 1``
(plain ``device_put`` would reject shardings that span non-addressable
devices). Every host builds the full dataset and JAX slices out each
process's addressable shards. The multi-process branch is exercised by
``tests/test_distributed.py``: two localhost processes initialize over CPU
(Gloo collectives), span one mesh, and run a real trainer epoch with loss
parity against single-process. The single-process path is identical to plain
``device_put``.

Sweep fan-out across hosts does NOT need this: independent trials should run
as independent single-host processes (one W&B/local agent each), which is
how the reference parallelizes sweeps too (multiple agents on one sweep id).
"""

from __future__ import annotations

import os

from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()


def initialize_multihost(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> None:
    """Initialize the JAX distributed runtime for a multi-host slice.

    Must be called before any other JAX use (backend initialization), once
    per host process. On Cloud TPU slices the arguments auto-detect from the
    TPU metadata; elsewhere they come from the standard env vars
    (``JAX_COORDINATOR_ADDRESS``/``JAX_NUM_PROCESSES``/``JAX_PROCESS_ID``)
    or explicit arguments. Do NOT call on a single-host setup — it raises
    when no coordinator can be determined or the backend already started.
    """
    import jax

    coordinator_address = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and "JAX_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and "JAX_PROCESS_ID" in os.environ:
        process_id = int(os.environ["JAX_PROCESS_ID"])

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _logger.info(
        "jax.distributed initialized: process %d/%d, %d local / %d global devices",
        jax.process_index(),
        jax.process_count(),
        jax.local_device_count(),
        jax.device_count(),
    )
