"""Seeding utilities.

The reference seeds python/numpy/torch global state
(``/root/reference/src/tsfmx/utils/seed.py:9-22``). JAX has no global PRNG —
randomness flows through explicit ``jax.random`` keys, which is inherently
deterministic and reproducible across backends. We keep a small global-state
shim for the host-side code paths that still use python/numpy randomness
(dataset shuffling), and a key factory for everything on device.
"""

from __future__ import annotations

import random

import jax
import numpy as np


def set_seed(seed: int) -> None:
    """Seed host-side global RNGs (python, numpy).

    Device-side randomness uses explicit keys from :func:`make_rng`, so no
    device/global seeding (the torch/cudnn analogue) is needed.
    """
    random.seed(seed)
    np.random.seed(seed)


def make_rng(seed: int | None) -> jax.Array:
    """Create a root PRNG key. ``None`` maps to a fixed default key."""
    return jax.random.key(seed if seed is not None else 0)
