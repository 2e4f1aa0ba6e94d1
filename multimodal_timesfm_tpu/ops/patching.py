"""Patching helpers: reshape raw series into fixed-size patches (static shapes for XLA)."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def patchify(x: jax.Array, patch_len: int) -> jax.Array:
    """(B, C) -> (B, C // patch_len, patch_len). C must be a static multiple of patch_len.

    Parity: reference ``tsfm/timesfm.py:54-55``.
    """
    batch, context = x.shape
    if context % patch_len != 0:
        raise ValueError(f"context length ({context}) must be divisible by patch length ({patch_len})")
    return x.reshape(batch, context // patch_len, patch_len)


def unpatchify(x: jax.Array) -> jax.Array:
    """(B, N, P) -> (B, N * P)."""
    batch = x.shape[0]
    return x.reshape(batch, -1)


def pad_and_patchify(x: jax.Array, patch_len: int) -> tuple[jax.Array, jax.Array]:
    """Left-pad a (B, C) series to a patch multiple, returning (patches, pad_mask).

    The pad mask is True at padded positions (project convention). Padding is
    applied on the left so the most recent data sits at the end of the last
    patch, matching standard TSFM decode alignment.
    """
    batch, context = x.shape
    rem = (-context) % patch_len
    if rem:
        x = jnp.pad(x, ((0, 0), (rem, 0)))
        mask = jnp.concatenate(
            [jnp.ones((batch, rem), bool), jnp.zeros((batch, context), bool)], axis=1
        )
    else:
        mask = jnp.zeros((batch, context), bool)
    return patchify(x, patch_len), patchify(mask, patch_len)
