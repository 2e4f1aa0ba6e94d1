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


@pytest.mark.parametrize("offset", [1e4, 1e6, -5e5])
def test_running_stats_large_offsets_no_cancellation(offset):
    """Raw-scale series (|mean| >> std) must not collapse sigma to 0 (fp32).

    Compares against float64 ground truth: at these offsets the shifted
    closed form is MORE accurate than the fp32 Welford scan (which carries
    ULP(offset)-scale noise through its incremental means).
    """
    rng = np.random.default_rng(0)
    x = (rng.normal(size=(2, 4, 8)) + offset).astype(np.float32)
    mask = np.zeros((2, 4, 8), bool)
    mu, sigma = masked_running_stats(jnp.asarray(x), jnp.asarray(mask))
    assert float(jnp.min(sigma)) > 0.5  # ~N(0,1) noise survives the offset

    xf = x.astype(np.float64)
    for b in range(2):
        seen = []
        for i in range(4):
            seen.extend(xf[b, i])
            np.testing.assert_allclose(float(sigma[b, i]), np.std(seen), rtol=1e-3)
            np.testing.assert_allclose(float(mu[b, i]), np.mean(seen), rtol=1e-6)


def test_running_stats_offset_with_leading_padding():
    """The shift picks the first VALID value even when the series is left-padded."""
    rng = np.random.default_rng(1)
    x = (rng.normal(size=(1, 3, 4)) + 1e5).astype(np.float32)
    mask = np.zeros((1, 3, 4), bool)
    mask[0, 0, :] = True  # entire first patch padded
    x[0, 0, :] = 0.0  # padded region holds garbage zeros
    mu, sigma = masked_running_stats(jnp.asarray(x), jnp.asarray(mask))
    assert float(sigma[0, 1]) < 10.0  # not inflated by the garbage zeros
    assert abs(float(mu[0, 1]) - 1e5) < 10.0


def test_pad_and_patchify():
    from multimodal_timesfm_tpu.ops.patching import pad_and_patchify, patchify, unpatchify

    x = jnp.arange(10, dtype=jnp.float32).reshape(1, 10)
    patches, mask = pad_and_patchify(x, 4)
    assert patches.shape == (1, 3, 4) and mask.shape == (1, 3, 4)
    # left-padded: first 2 positions masked, data right-aligned
    assert bool(mask[0, 0, 0]) and bool(mask[0, 0, 1]) and not bool(mask[0, 0, 2])
    np.testing.assert_array_equal(np.asarray(patches[0, 2]), [6, 7, 8, 9])

    # aligned input: no padding, mask all-False
    aligned, amask = pad_and_patchify(jnp.ones((2, 8)), 4)
    assert not bool(amask.any())
    np.testing.assert_array_equal(np.asarray(unpatchify(aligned)), np.ones((2, 8)))

    with pytest.raises(ValueError, match="divisible"):
        patchify(jnp.ones((1, 10)), 4)
