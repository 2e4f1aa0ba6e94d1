"""Checkpoint persistence: save/load/rotate with the reference's policies.

Parity: reference trainer checkpointing
(``/root/reference/src/tsfmx/trainer.py:285-354``) — TypedDict-shaped
payloads carrying epoch/global_step/optimizer state/best_val_loss plus the
mode-specific parameter subtree, epoch-numbered files with
``save_total_limit`` rotation, and a separate ``best_model`` file.

Backends:
  * ``pickle`` (default): host-numpy pytree pickles — portable across mesh
    shapes (params are replicated, so gather is free), and preserves optax
    namedtuple state structure exactly (lossless resume).
  * ``orbax``: directory checkpoints via ``orbax.checkpoint`` for
    sharded / async / cloud-storage needs. Restoring optimizer state with
    full structure requires passing a ``target`` template (orbax restores
    plain containers otherwise).
"""

from __future__ import annotations

from typing import Any

import pickle
import shutil
from pathlib import Path

import jax
import numpy as np

from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()

CKPT_SUFFIX = ".ckpt"


def save_checkpoint(path: Path, payload: dict, backend: str = "pickle") -> None:
    """Persist a checkpoint payload; device arrays are pulled to host numpy.

    Both backends overwrite atomically-enough that a crash mid-save never
    destroys an existing checkpoint at ``path``: the new payload is fully
    written to a sibling temp location first, and the old copy is only
    removed immediately before the (fast) rename.
    """
    host = jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray)) else x, payload
    )
    path.parent.mkdir(parents=True, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        tmp = path.with_name(path.name + ".tmp-orbax")
        if tmp.exists():
            shutil.rmtree(tmp)
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(tmp.resolve(), host)
        checkpointer.wait_until_finished()
        if path.exists():
            shutil.rmtree(path) if path.is_dir() else path.unlink()
        tmp.rename(path)
        return
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: Path, target: Any = None) -> dict:
    """Load a checkpoint (auto-detects backend: orbax dirs vs pickle files)."""
    path = Path(path)
    if path.is_dir():
        import orbax.checkpoint as ocp

        checkpointer = ocp.StandardCheckpointer()
        return checkpointer.restore(path.resolve(), target) if target is not None else (
            checkpointer.restore(path.resolve())
        )
    with open(path, "rb") as f:
        return pickle.load(f)


def rotate_checkpoints(checkpoint_dir: Path, save_total_limit: int) -> None:
    """Delete oldest epoch checkpoints beyond the limit (reference ``trainer.py:312-323``).

    Handles both pickle files and orbax directory checkpoints.
    ``save_total_limit=0`` deletes every epoch checkpoint (the ``[:-0]``
    slice idiom would silently keep them all).
    """
    checkpoints = sorted(
        checkpoint_dir.glob(f"checkpoint_epoch_*{CKPT_SUFFIX}"),
        key=lambda p: int(p.stem.rsplit("_", 1)[-1]),
    )
    for checkpoint in checkpoints[: max(0, len(checkpoints) - save_total_limit)]:
        if checkpoint.is_dir():
            shutil.rmtree(checkpoint)
        else:
            checkpoint.unlink()
        _logger.info("Deleted old checkpoint: %s", checkpoint.name)


def restructure_like(template: Any, restored: Any) -> Any:
    """Rebuild plain-container ``restored`` data into ``template``'s pytree.

    An orbax restore without a ``target`` returns plain containers —
    namedtuples (optax optimizer states) come back as dicts keyed by field
    name, tuples as lists. Resuming with that structure crashes the first
    ``optimizer.update`` (``state.mu`` on a dict). This walks the template
    (e.g. a fresh ``optimizer.init(params)``) and re-wraps the restored
    values into the template's container types, matching namedtuple fields
    BY NAME so no leaf-ordering assumptions are made.
    """
    if template is None:
        return None
    if isinstance(template, tuple) and hasattr(template, "_fields"):  # namedtuple
        if not template._fields:  # e.g. optax.EmptyState
            return type(template)()
        if isinstance(restored, dict):
            return type(template)(
                **{f: restructure_like(getattr(template, f), restored.get(f)) for f in template._fields}
            )
        if restored is None:
            raise ValueError(
                f"checkpoint is missing data for {type(template).__name__} "
                f"(fields {template._fields})"
            )
        return type(template)(*(restructure_like(t, r) for t, r in zip(template, restored)))
    if isinstance(template, (list, tuple)):
        if restored is None or len(restored) != len(template):
            raise ValueError(
                f"checkpoint sequence length {None if restored is None else len(restored)} "
                f"!= template length {len(template)}"
            )
        seq = [restructure_like(t, r) for t, r in zip(template, restored)]
        return type(template)(seq) if isinstance(template, tuple) else seq
    if isinstance(template, dict):
        if not isinstance(restored, dict):
            raise ValueError(f"checkpoint node {type(restored).__name__} != template dict")
        return {k: restructure_like(v, restored.get(k)) for k, v in template.items()}
    return restored
