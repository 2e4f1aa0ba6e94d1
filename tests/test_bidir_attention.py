"""Fused bidirectional attention (Chronos encoder kernel): interpret-mode
parity with the XLA oracle — forward, q/k/v grads, and the in-kernel
batch-accumulated bias gradient (the piece baseline mode trains)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.ops.bidir_attention import (
    bidir_pack,
    fused_bidir_attention,
    make_packed_bias,
    xla_bidir_attention,
)


def _inputs(batch=2, seq=16, heads=4, dim=8, seed=0):
    rng = np.random.default_rng(seed)
    q, k, v = (
        jnp.asarray(rng.normal(size=(batch, seq, heads, dim)), jnp.float32)
        for _ in range(3)
    )
    bias = jnp.asarray(rng.normal(size=(heads, seq, seq)), jnp.float32)
    valid = jnp.asarray(rng.random((batch, seq)) > 0.2)
    valid = valid.at[:, 0].set(True)
    return q, k, v, bias, valid


def test_make_packed_bias_blockdiag_layout():
    heads, seq, pack, pad_to = 4, 6, 2, 8
    bias = jnp.arange(heads * seq * seq, dtype=jnp.float32).reshape(heads, seq, seq)
    exp = make_packed_bias(bias, pack, pad_to)
    assert exp.shape == (2, 16, 16)
    for g in range(2):
        for p in range(pack):
            h = g * pack + p
            blk = exp[g, p * pad_to : p * pad_to + seq, p * pad_to : p * pad_to + seq]
            np.testing.assert_array_equal(np.asarray(blk), np.asarray(bias[h]))
            # off-diagonal blocks zero
            other = exp[g, p * pad_to : (p + 1) * pad_to, (1 - p) * pad_to : (2 - p) * pad_to]
            np.testing.assert_array_equal(np.asarray(other), 0.0)


@pytest.mark.parametrize("pack", [1, 2, 4])
def test_bidir_forward_matches_xla(pack):
    q, k, v, bias, valid = _inputs(seed=1)
    ref = xla_bidir_attention(q, k, v, valid, bias)
    exp = make_packed_bias(bias, pack, q.shape[1])
    out = fused_bidir_attention(q, k, v, valid, exp, True, pack)
    # padded-QUERY rows are well-defined in bidirectional attention (they
    # attend the valid keys), so the whole tensor must match
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


@pytest.mark.parametrize("pack", [1, 2, 4])
def test_bidir_grads_match_xla_including_bias(pack):
    q, k, v, bias, valid = _inputs(seed=2)

    def loss_fused(q, k, v, bias):
        exp = make_packed_bias(bias, pack, q.shape[1])
        return jnp.sum(fused_bidir_attention(q, k, v, valid, exp, True, pack) ** 2)

    def loss_xla(q, k, v, bias):
        return jnp.sum(xla_bidir_attention(q, k, v, valid, bias) ** 2)

    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3))(q, k, v, bias)
    g_xla = jax.grad(loss_xla, argnums=(0, 1, 2, 3))(q, k, v, bias)
    for a, b in zip(g_fused, g_xla):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)


def test_bidir_padded_seq_matches_xla():
    """Launch-side padding (S=6 -> pad_to=8): pad keys invalid, rows sliced."""
    q, k, v, bias, valid = _inputs(seq=6, seed=3)
    pad = 2
    widths = ((0, 0), (0, pad), (0, 0), (0, 0))
    qp, kp, vp = (jnp.pad(t, widths) for t in (q, k, v))
    validp = jnp.pad(valid, ((0, 0), (0, pad)))
    exp = make_packed_bias(bias, 2, 8)
    out = fused_bidir_attention(qp, kp, vp, validp, exp, True, 2)[:, :6]
    ref = xla_bidir_attention(q, k, v, valid, bias)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_bidir_no_cross_slice_leakage():
    q, k, v, bias, valid = _inputs(batch=1, seed=4)
    exp = make_packed_bias(bias, 4, q.shape[1])
    base = fused_bidir_attention(q, k, v, valid, exp, True, 4)
    pert = fused_bidir_attention(
        q, k.at[:, :, 0].add(100.0), v.at[:, :, 0].add(100.0), valid, exp, True, 4
    )
    np.testing.assert_allclose(
        np.asarray(base[:, :, 1:]), np.asarray(pert[:, :, 1:]), atol=1e-5
    )
    assert not np.allclose(np.asarray(base[:, :, 0]), np.asarray(pert[:, :, 0]))


def test_bidir_pack_gate(monkeypatch):
    from multimodal_timesfm_tpu.ops import attention as A

    assert bidir_pack(72, 12, 64) is None  # CPU backend
    monkeypatch.setattr(A.jax, "default_backend", lambda: "tpu")
    # Opt-in: the fused path measured -24% end-to-end (docs/PERF.md r4).
    assert bidir_pack(72, 12, 64) is None
    monkeypatch.setenv("MTT_CHRONOS_FUSED_ATTN", "1")
    assert bidir_pack(72, 12, 64) == 6      # 432 rows (Chronos mop64 geometry)
    assert bidir_pack(72, 12, 512) is None  # head dim too large
    assert bidir_pack(67, 12, 64) is None   # non-multiple-of-8 (caller pads)
    assert bidir_pack(512, 1, 64) == 1      # classic whole-seq regime
    assert bidir_pack(64, 2, 64) is None    # cannot reach 256 rows: XLA


def test_chronos_encoder_fused_matches_xla(monkeypatch):
    """chronos_encoder with the fused path (forced via gate monkeypatch,
    interpret-mode kernels) matches its own XLA path, grads included."""
    from jax.experimental.pallas import tpu as pltpu

    from multimodal_timesfm_tpu.models import chronos as C

    cfg = C.Chronos2Config.tiny()  # model_dim 32, 2 heads, head_dim 16
    params = C.init_chronos(jax.random.key(0), cfg)
    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(4, 8, cfg.model_dim)), jnp.float32)
    mask = jnp.ones((4, 8), jnp.float32).at[1, :3].set(0.0)

    def run(params, x):
        return C.chronos_encoder(params["encoder"], cfg, x, mask)

    ref, ref_grads = jax.value_and_grad(lambda p, x: jnp.sum(run(p, x) ** 2), argnums=(0, 1))(
        params, x
    )

    # Force the fused path: gate selects pack=2 (the encoder imports
    # bidir_pack per call, so the module attr patch takes effect), kernels
    # run under the interpreter on CPU.
    import multimodal_timesfm_tpu.ops.bidir_attention as B

    monkeypatch.setattr(B, "bidir_pack", lambda s, h, d: 2)
    with pltpu.force_tpu_interpret_mode():
        out, grads = jax.value_and_grad(
            lambda p, x: jnp.sum(run(p, x) ** 2), argnums=(0, 1)
        )(params, x)

    np.testing.assert_allclose(float(out), float(ref), rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2e-4
        ),
        grads,
        ref_grads,
    )
