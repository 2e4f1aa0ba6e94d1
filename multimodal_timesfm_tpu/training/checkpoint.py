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

import pickle
import shutil
from pathlib import Path

import jax
import numpy as np

from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()

CKPT_SUFFIX = ".ckpt"


def save_checkpoint(path: Path, payload: dict, backend: str = "pickle") -> None:
    """Persist a checkpoint payload; device arrays are pulled to host numpy."""
    host = jax.tree.map(
        lambda x: np.asarray(x) if isinstance(x, (jax.Array, np.ndarray)) else x, payload
    )
    path.parent.mkdir(parents=True, exist_ok=True)
    if backend == "orbax":
        import orbax.checkpoint as ocp

        if path.exists():
            shutil.rmtree(path) if path.is_dir() else path.unlink()
        checkpointer = ocp.StandardCheckpointer()
        checkpointer.save(path.resolve(), host)
        checkpointer.wait_until_finished()
        return
    tmp = path.with_suffix(path.suffix + ".tmp")
    with open(tmp, "wb") as f:
        pickle.dump(host, f, protocol=pickle.HIGHEST_PROTOCOL)
    tmp.replace(path)


def load_checkpoint(path: Path, target=None) -> dict:
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
    """
    checkpoints = sorted(
        checkpoint_dir.glob(f"checkpoint_epoch_*{CKPT_SUFFIX}"),
        key=lambda p: int(p.stem.rsplit("_", 1)[-1]),
    )
    for checkpoint in checkpoints[:-save_total_limit] if len(checkpoints) > save_total_limit else []:
        if checkpoint.is_dir():
            shutil.rmtree(checkpoint)
        else:
            checkpoint.unlink()
        _logger.info("Deleted old checkpoint: %s", checkpoint.name)
