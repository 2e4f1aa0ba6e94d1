"""Golden-value and property tests for masked running stats + RevIN.

The closed-form cumulative implementation is pinned against (a) a numpy
oracle that literally accumulates valid points per patch prefix, and (b) the
sequential Welford scan.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.ops.revin import (
    masked_running_stats,
    masked_running_stats_scan,
    revin,
)


def _numpy_oracle(x, mask):
    b, n, p = x.shape
    mu = np.zeros((b, n))
    sigma = np.zeros((b, n))
    for bi in range(b):
        seen = []
        for ni in range(n):
            seen.extend(x[bi, ni][~mask[bi, ni]].tolist())
            if seen:
                mu[bi, ni] = np.mean(seen)
                sigma[bi, ni] = np.std(seen)
    return mu, sigma


@pytest.mark.parametrize("seed", [0, 1])
def test_running_stats_match_numpy_oracle(seed):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(3, 5, 4)).astype(np.float32)
    mask = rng.random((3, 5, 4)) < 0.3
    mask[:, 0, 0] = False  # ensure at least one valid point in the first patch

    mu, sigma = masked_running_stats(jnp.asarray(x), jnp.asarray(mask))
    mu_ref, sigma_ref = _numpy_oracle(x, mask)
    np.testing.assert_allclose(np.asarray(mu), mu_ref, atol=1e-5)
    np.testing.assert_allclose(np.asarray(sigma), sigma_ref, atol=1e-5)


def test_closed_form_matches_welford_scan():
    rng = np.random.default_rng(42)
    x = rng.normal(size=(2, 8, 16)).astype(np.float32)
    mask = rng.random((2, 8, 16)) < 0.5

    mu_a, sig_a = masked_running_stats(jnp.asarray(x), jnp.asarray(mask))
    mu_b, sig_b = masked_running_stats_scan(jnp.asarray(x), jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(mu_a), np.asarray(mu_b), atol=1e-5)
    np.testing.assert_allclose(np.asarray(sig_a), np.asarray(sig_b), atol=1e-5)


def test_all_masked_prefix_gives_zero_stats():
    x = jnp.ones((1, 3, 4))
    mask = jnp.array([[[True] * 4, [False] * 4, [False] * 4]])
    mu, sigma = masked_running_stats(x, mask)
    assert mu[0, 0] == 0.0 and sigma[0, 0] == 0.0
    np.testing.assert_allclose(mu[0, 1], 1.0, atol=1e-6)


def test_revin_roundtrip():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(2, 4, 8)).astype(np.float32) * 5 + 3)
    mask = jnp.zeros((2, 4, 8), bool)
    mu, sigma = masked_running_stats(x, mask)
    normed = revin(x, mu, sigma, reverse=False)
    back = revin(normed, mu, sigma, reverse=True)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-4)


def test_revin_degenerate_sigma_uses_unit_scale():
    x = jnp.full((1, 2, 4), 7.0)
    mu = jnp.full((1, 2), 7.0)
    sigma = jnp.zeros((1, 2))
    normed = revin(x, mu, sigma)
    np.testing.assert_allclose(np.asarray(normed), 0.0, atol=1e-6)


def test_revin_broadcasts_over_channel_dims():
    x = jnp.ones((1, 2, 8, 10))
    mu = jnp.zeros((1, 2))
    sigma = jnp.full((1, 2), 2.0)
    out = revin(x, mu, sigma, reverse=True)
    assert out.shape == (1, 2, 8, 10)
    np.testing.assert_allclose(np.asarray(out), 2.0)
