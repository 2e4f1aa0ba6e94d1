"""Reversible instance normalization (RevIN) with masked running statistics.

Semantics parity with the reference's preprocessing
(``/root/reference/src/tsfmx/tsfm/timesfm.py:58-71``): for each input patch
``i``, the normalization stats are the mean/std of all *valid* (unmasked)
time-series points in patches ``0..i`` — a causal running estimate, so patch
embeddings never see future statistics.

The reference runs a sequential per-patch Welford update in a Python loop.
On TPU that loop is the enemy: it serializes B-wide vector work behind
``num_patches`` dispatches. Here the same quantity is computed in closed form
from cumulative masked moments:

    n_i   = sum_{j<=i} count_valid(patch_j)
    mu_i  = cumsum(masked values) / n_i
    var_i = cumsum(masked values^2) / n_i - mu_i^2

Two cumsums on the VPU replace the scan. A ``lax.scan`` Welford
implementation is kept as the reference oracle for tests
(:func:`masked_running_stats_scan`) — the two agree to fp tolerance.

Mask convention: **True = padded** (reference ``tsfm/base.py:16``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_STD_EPS = 1e-6


def masked_running_stats(
    patched_inputs: jax.Array,
    patched_masks: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Per-patch-prefix masked mean/std, vectorized.

    The naive cumulative formula ``E[x^2] - E[x]^2`` catastrophically cancels
    in fp32 once ``|mean| >> std`` (a raw-scale series with offset ~1e4
    collapses sigma to 0). Each series is therefore shifted by its first
    valid value before accumulating — variance is shift-invariant and the
    shifted values are O(data range), so the cumulants stay well-conditioned
    for any absolute offset.

    Args:
        patched_inputs: (B, N, P) float values.
        patched_masks: (B, N, P) bool, True = padded.

    Returns:
        (mu, sigma): each (B, N). ``sigma`` is the population std (ddof=0) of
        the valid points in patches 0..i; 0 where no valid points seen yet.
    """
    batch, num_patches, patch = patched_inputs.shape
    flat_x = patched_inputs.reshape(batch, -1)
    flat_valid = (~patched_masks).reshape(batch, -1)

    # Shift by the first valid value of each series (0 if none are valid).
    first_idx = jnp.argmax(flat_valid, axis=-1)
    any_valid = jnp.any(flat_valid, axis=-1)
    shift = jnp.where(any_valid, jnp.take_along_axis(flat_x, first_idx[:, None], 1)[:, 0], 0.0)

    valid = flat_valid.reshape(batch, num_patches, patch).astype(patched_inputs.dtype)
    x = (patched_inputs - shift[:, None, None]) * valid

    n = jnp.cumsum(jnp.sum(valid, axis=-1), axis=-1)  # (B, N)
    s1 = jnp.cumsum(jnp.sum(x, axis=-1), axis=-1)
    s2 = jnp.cumsum(jnp.sum(x * x, axis=-1), axis=-1)

    safe_n = jnp.maximum(n, 1.0)
    mu_shifted = s1 / safe_n
    var = jnp.maximum(s2 / safe_n - mu_shifted * mu_shifted, 0.0)
    sigma = jnp.sqrt(var)
    mu = mu_shifted + shift[:, None]
    seen = n > 0
    return jnp.where(seen, mu, 0.0), jnp.where(seen, sigma, 0.0)


def masked_running_stats_scan(
    patched_inputs: jax.Array,
    patched_masks: jax.Array,
) -> tuple[jax.Array, jax.Array]:
    """Sequential Welford-style oracle (mirrors the reference's update loop).

    Same output contract as :func:`masked_running_stats`; used in tests to
    pin the closed-form implementation and kept as a numerically-hardened
    fallback should extreme-scale inputs ever need it.
    """
    batch = patched_inputs.shape[0]
    dtype = patched_inputs.dtype

    def step(carry, xs):
        n, mu, m2 = carry
        x, mask = xs  # (B, P)
        valid = (~mask).astype(dtype)
        n_b = jnp.sum(valid, axis=-1)
        safe_nb = jnp.maximum(n_b, 1.0)
        mu_b = jnp.sum(x * valid, axis=-1) / safe_nb
        m2_b = jnp.sum(valid * (x - mu_b[:, None]) ** 2, axis=-1)

        n_new = n + n_b
        safe_n = jnp.maximum(n_new, 1.0)
        delta = mu_b - mu
        mu_new = mu + delta * n_b / safe_n
        m2_new = m2 + m2_b + delta * delta * n * n_b / safe_n
        # Hold previous stats when the patch contributes nothing.
        has = n_b > 0
        mu_new = jnp.where(has, mu_new, mu)
        m2_new = jnp.where(has, m2_new, m2)
        sigma = jnp.where(n_new > 0, jnp.sqrt(jnp.maximum(m2_new / safe_n, 0.0)), 0.0)
        return (n_new, mu_new, m2_new), (mu_new, sigma)

    zeros = jnp.zeros((batch,), dtype)
    xs = (jnp.swapaxes(patched_inputs, 0, 1), jnp.swapaxes(patched_masks, 0, 1))
    _, (mu, sigma) = jax.lax.scan(step, (zeros, zeros, zeros), xs)
    return jnp.swapaxes(mu, 0, 1), jnp.swapaxes(sigma, 0, 1)


def revin(
    x: jax.Array,
    mu: jax.Array,
    sigma: jax.Array,
    reverse: bool = False,
) -> jax.Array:
    """(Un-)normalize ``x`` with per-(batch, patch) stats broadcast over trailing dims.

    Parity: reference ``timesfm.py:70,127`` (``revin`` from
    ``timesfm.torch.util``). ``sigma`` below ``1e-6`` is treated as 1.0, the
    same degenerate-std convention the reference dataset uses for z-scoring
    (``examples/time_mmd/data/time_mmd_dataset.py:149-161``).

    Args:
        x: (B, N, ...) values.
        mu, sigma: (B, N) running stats.
        reverse: False -> normalize, True -> denormalize.
    """
    extra = x.ndim - mu.ndim
    mu = mu.reshape(mu.shape + (1,) * extra)
    sigma = sigma.reshape(sigma.shape + (1,) * extra)
    safe_sigma = jnp.where(sigma < _STD_EPS, 1.0, sigma)
    if reverse:
        return x * safe_sigma + mu
    return (x - mu) / safe_sigma
