"""Fused-qkv attention kernel: interpreter-mode parity with the XLA path.

The kernel consumes the raw (B, S, 3*H*D) qkv GEMM output and returns
(B, S, H*D); its backward recomputes the weights and returns dqkv in the
same fused layout (ops/qkv_attention.py). Parity oracle: the classic
slice/reshape + ``xla_causal_attention`` composition it replaces.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.ops.attention import xla_causal_attention
from multimodal_timesfm_tpu.ops.qkv_attention import (
    _row_tile,
    fused_qkv_causal_attention,
    supports_qkv_fused,
)


def _oracle(qkv, valid, heads, dim):
    b, s, _ = qkv.shape
    hd = heads * dim
    q = qkv[..., :hd].reshape(b, s, heads, dim)
    k = qkv[..., hd : 2 * hd].reshape(b, s, heads, dim)
    v = qkv[..., 2 * hd :].reshape(b, s, heads, dim)
    return xla_causal_attention(q, k, v, valid).reshape(b, s, hd)


def _inputs(batch=3, seq=16, heads=4, dim=8, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.normal(size=(batch, seq, 3 * heads * dim)), dtype)
    valid = jnp.asarray(rng.random((batch, seq)) > 0.2)
    valid = valid.at[:, 0].set(True)
    return qkv, valid


@pytest.mark.parametrize(
    "seq,heads,dim",
    [
        (16, 4, 8),  # pack > 1 (multi-head groups per matmul)
        (16, 3, 8),  # heads not a power of two
        (64, 4, 16),  # pack covers all heads
        (8, 2, 8),  # minimal sublane block
    ],
)
def test_forward_matches_oracle(seq, heads, dim):
    qkv, valid = _inputs(seq=seq, heads=heads, dim=dim)
    ref = _oracle(qkv, valid, heads, dim)
    out = fused_qkv_causal_attention(qkv, valid, heads, dim, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_oracle():
    qkv, valid = _inputs(seed=2)
    heads, dim = 4, 8

    def loss_kernel(qkv):
        return jnp.sum(fused_qkv_causal_attention(qkv, valid, heads, dim, True) ** 2)

    def loss_oracle(qkv):
        return jnp.sum(_oracle(qkv, valid, heads, dim) ** 2)

    g_kernel = jax.grad(loss_kernel)(qkv)
    g_oracle = jax.grad(loss_oracle)(qkv)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_oracle), atol=2e-4, rtol=1e-4
    )


def test_gradients_match_oracle_bf16():
    qkv, valid = _inputs(seed=3, dtype=jnp.bfloat16)
    heads, dim = 4, 8
    g = jnp.asarray(
        np.random.default_rng(4).normal(size=(3, 16, heads * dim)), jnp.bfloat16
    )

    def run(fn):
        out, vjp = jax.vjp(lambda q: fn(q), qkv)
        return out, vjp(g)[0]

    out_k, dq_k = run(lambda q: fused_qkv_causal_attention(q, valid, heads, dim, True))
    out_o, dq_o = run(lambda q: _oracle(q, valid, heads, dim))
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_o, np.float32), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(dq_k, np.float32), np.asarray(dq_o, np.float32), atol=6e-2
    )


@pytest.mark.parametrize("save2d", [True, False, None])
def test_residual_save_modes_match_oracle(monkeypatch, save2d):
    """The 2D-collapse residual save (forced on, forced off, or the default
    seq-gated auto) must stay gradient-exact with the oracle
    (ops/qkv_attention.py _SAVE2D)."""
    from multimodal_timesfm_tpu.ops import qkv_attention as QA

    monkeypatch.setattr(QA, "_SAVE2D", save2d)
    qkv, valid = _inputs(seed=5)
    heads, dim = 4, 8
    ref = _oracle(qkv, valid, heads, dim)
    out = fused_qkv_causal_attention(qkv, valid, heads, dim, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)

    g_kernel = jax.grad(
        lambda q: jnp.sum(fused_qkv_causal_attention(q, valid, heads, dim, True) ** 2)
    )(qkv)
    g_oracle = jax.grad(lambda q: jnp.sum(_oracle(q, valid, heads, dim) ** 2))(qkv)
    np.testing.assert_allclose(
        np.asarray(g_kernel), np.asarray(g_oracle), atol=2e-4, rtol=1e-4
    )


def test_row_tile_divides_and_caps():
    assert _row_tile(1024, 16) == 16  # 256 packed rows
    assert _row_tile(1024, 64) == 4
    assert _row_tile(1024, 256) == 1
    assert _row_tile(3, 16) == 3  # batch not a power of two
    assert _row_tile(6, 128) == 2


def test_gate_is_off_without_tpu():
    # CPU backend: the jitted model path must never route into the kernel
    # (interpret mode is reserved for these tests).
    assert not supports_qkv_fused(16, 16, 80)


def test_layers_path_matches_xla_when_forced(monkeypatch):
    """causal_attention with the kernel gate forced on (interpret) equals
    the default XLA path, including the per-dim scale application."""
    from multimodal_timesfm_tpu.models import layers as L
    from multimodal_timesfm_tpu.ops import qkv_attention as QA

    heads, dim, d_model = 4, 8, 32
    params = L.init_attention(jax.random.key(0), d_model, heads, dim)
    params["per_dim_scale"] = params["per_dim_scale"] + 0.3  # exercise the scale
    x = jax.random.normal(jax.random.key(1), (2, 16, d_model), jnp.float32)
    pad = jnp.zeros((2, 16), bool).at[:, -3:].set(True)

    ref = L.causal_attention(params, x, pad, heads, dim)

    monkeypatch.setattr(QA, "supports_qkv_fused", lambda *a: True)
    monkeypatch.setattr(
        QA,
        "fused_qkv_causal_attention",
        lambda qkv, kv, h, d, interpret=False: fused_qkv_causal_attention(
            qkv, kv, h, d, True
        ),
    )
    got = L.causal_attention(params, x, pad, heads, dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)
