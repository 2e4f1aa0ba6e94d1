"""Pallas fused attention: interpreter-mode parity with the XLA path + grads."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.ops.attention import (
    fused_causal_attention,
    supports_pallas,
    xla_causal_attention,
)


def _inputs(batch=2, seq=16, heads=2, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    q = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
    valid = jnp.asarray(rng.random((batch, seq)) > 0.2)
    valid = valid.at[:, 0].set(True)
    return q, k, v, valid


def test_kernel_matches_xla_forward():
    q, k, v, valid = _inputs()
    ref = xla_causal_attention(q, k, v, valid)
    out = fused_causal_attention(q, k, v, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_matches_xla_forward_all_valid():
    q, k, v, _ = _inputs(seed=1)
    valid = jnp.ones(q.shape[:2], bool)
    ref = xla_causal_attention(q, k, v, valid)
    out = fused_causal_attention(q, k, v, valid, interpret=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_kernel_gradients_match_xla():
    q, k, v, valid = _inputs(seed=2)

    def loss_kernel(q, k, v):
        return jnp.sum(fused_causal_attention(q, k, v, valid, interpret=True) ** 2)

    def loss_xla(q, k, v):
        return jnp.sum(xla_causal_attention(q, k, v, valid) ** 2)

    g_kernel = jax.grad(loss_kernel, argnums=(0, 1, 2))(q, k, v)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_kernel, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_causality_in_kernel():
    q, k, v, valid = _inputs(seed=3)
    out_a = fused_causal_attention(q, k, v, valid, interpret=True)
    out_b = fused_causal_attention(
        q, k.at[:, -1].add(10.0), v.at[:, -1].add(10.0), valid, interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(out_a[:, :-1]), np.asarray(out_b[:, :-1]), atol=1e-5
    )


def test_supports_pallas_gates(monkeypatch):
    # CPU backend in tests -> always False; the shape logic is still exercised.
    assert not supports_pallas(1, 80)
    assert not supports_pallas(17, 80)
    assert not supports_pallas(2048, 80)  # backward VMEM cap
    from multimodal_timesfm_tpu.ops import attention as A

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    assert A.supports_pallas(512, 80)   # classic regime on
    assert A.supports_pallas(1024, 80)  # backward VMEM upper bound inclusive
    assert not A.supports_pallas(16, 80)   # small S: qkv row-tile kernel's regime
    assert not A.supports_pallas(2048, 80)


def test_flash_matches_xla_forward_interpret():
    """Tiled flash path (interpret mode) matches XLA on a padded batch.

    Flash block sizes need seq >= 128; padding enters via segment ids, so
    valid queries must agree with the XLA mask exactly. Padded-QUERY rows are
    garbage by contract and excluded from the comparison.
    """
    from multimodal_timesfm_tpu.ops.attention import flash_causal_attention

    rng = np.random.default_rng(7)
    batch, seq, heads, dim = 2, 256, 2, 128
    q = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32) * 0.1
    k = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
    valid = jnp.ones((batch, seq), bool).at[1, :64].set(False)  # left-padded row

    out_flash = flash_causal_attention(q, k, v, valid, interpret=True)
    out_xla = xla_causal_attention(q, k, v, valid)
    mask = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out_flash) * mask, np.asarray(out_xla) * mask, atol=2e-5
    )


def test_flash_gradients_match_xla_interpret():
    from multimodal_timesfm_tpu.ops.attention import flash_causal_attention

    rng = np.random.default_rng(9)
    batch, seq, heads, dim = 1, 128, 2, 128
    q = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32) * 0.1
    k = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
    valid = jnp.ones((batch, seq), bool)

    def loss(fn):
        return jax.grad(
            lambda q, k, v: jnp.sum(fn(q, k, v, valid) ** 2), argnums=(0, 1, 2)
        )

    # The custom-VJP backward kernel is traced outside the wrapper's own
    # interpret context, so on CPU the whole grad computation must run under
    # force_tpu_interpret_mode.
    from jax.experimental.pallas import tpu as pltpu

    with pltpu.force_tpu_interpret_mode():
        g_flash = loss(flash_causal_attention)(q, k, v)
    g_xla = loss(xla_causal_attention)(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=5e-4)


def test_supports_flash_gates():
    # CPU backend in tests -> always False; shape logic still exercised.
    from multimodal_timesfm_tpu.ops.attention import supports_flash

    assert not supports_flash(2048, 80)  # XLA still faster there
    assert not supports_flash(4096, 80)  # false only because backend is CPU


def test_flash_pads_non_tile_multiple_seq():
    """Non-128-multiple S routes through tile padding and still matches XLA
    (VERDICT r2 weak #2: S=2112-style contexts used to fall back to the
    XLA path, which OOMs beyond S=2048 on v5e)."""
    from multimodal_timesfm_tpu.ops.attention import flash_causal_attention

    rng = np.random.default_rng(5)
    batch, seq, heads, dim = 2, 160, 2, 8  # 160 % 128 != 0 -> pads to 256
    q, k, v = (
        jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
        for _ in range(3)
    )
    lengths = [seq, seq - 37]
    valid = jnp.asarray(np.arange(seq)[None, :] < np.asarray(lengths)[:, None])

    out_flash = flash_causal_attention(q, k, v, valid, interpret=True)
    out_xla = xla_causal_attention(q, k, v, valid)
    assert out_flash.shape == (batch, seq, heads, dim)
    mask = np.asarray(valid)[:, :, None, None]
    np.testing.assert_allclose(
        np.asarray(out_flash) * mask, np.asarray(out_xla) * mask, atol=2e-5
    )


def test_flash_padded_grads_match_xla_interpret():
    """Backward through the tile-padding route matches XLA grads."""
    from jax.experimental.pallas import tpu as pltpu

    from multimodal_timesfm_tpu.ops.attention import flash_causal_attention

    rng = np.random.default_rng(6)
    batch, seq, heads, dim = 1, 136, 1, 8  # pads to 256
    q, k, v = (
        jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
        for _ in range(3)
    )
    valid = jnp.ones((batch, seq), bool)

    def loss(attn):
        def f(q, k, v):
            return jnp.sum(attn(q, k, v, valid) ** 2)

        return jax.grad(f, argnums=(0, 1, 2))

    with pltpu.force_tpu_interpret_mode():
        g_flash = loss(flash_causal_attention)(q, k, v)
    g_xla = loss(xla_causal_attention)(q, k, v)
    for a, b in zip(g_flash, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=3e-4)


def test_supports_flash_covers_non_multiples(monkeypatch):
    """On TPU the gate now admits any S > 2048 (padding handles tiling)."""
    import multimodal_timesfm_tpu.ops.attention as attention_mod

    monkeypatch.setattr(attention_mod.jax, "default_backend", lambda: "tpu")
    assert attention_mod.supports_flash(2112, 80)  # the old silent seam
    assert attention_mod.supports_flash(4096, 80)
    assert not attention_mod.supports_flash(2048, 80)  # XLA still faster
    assert not attention_mod.supports_flash(4096, 512)  # head dim too large


def test_force_xla_attention_disables_kernel_gates(monkeypatch):
    """Serving exports trace under force_xla_attention: both Pallas gates
    must report False even on a TPU backend (custom calls are not portable
    across a multi-platform jax.export artifact)."""
    from multimodal_timesfm_tpu.ops import attention as A

    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    assert A.supports_pallas(512, 80) and A.supports_flash(4096, 80)
    with A.force_xla_attention():
        assert not A.supports_pallas(512, 80)
        assert not A.supports_flash(4096, 80)
    assert A.supports_pallas(512, 80) and A.supports_flash(4096, 80)  # restored
