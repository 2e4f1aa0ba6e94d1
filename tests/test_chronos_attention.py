"""Fused Chronos row-tile attention: interpreter-mode parity with the XLA path.

The kernel consumes the raw (B, S, 3*H*D) qkv GEMM output plus segment ids
and the pretiled rel-pos bias, returning (B, S, H*D); its backward
recomputes the weights and returns dqkv and the accumulated block-diagonal
bias cotangent (ops/chronos_attention.py). Parity oracles: a direct jnp
composition of the T5 attention it replaces, and the Chronos encoder's
default XLA path (including packed segment_ids and trainable-bias grads).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.ops.chronos_attention import (
    _row_tile,
    fused_chronos_attention,
    make_rowtile_bias,
    supports_chronos_rowtile,
)

NEG = jnp.finfo(jnp.float32).min


def _oracle(qkv, seg, bias_hss, heads, dim):
    b, s, _ = qkv.shape
    hd = heads * dim
    q = qkv[..., :hd].reshape(b, s, heads, dim)
    k = qkv[..., hd : 2 * hd].reshape(b, s, heads, dim)
    v = qkv[..., 2 * hd :].reshape(b, s, heads, dim)
    logits = jnp.einsum("bqhd,bkhd->bhqk", q, k, preferred_element_type=jnp.float32)
    logits = logits + bias_hss[None].astype(jnp.float32)
    same = seg[:, :, None] == seg[:, None, :]  # (b, s, s)
    logits = jnp.where(same[:, None], logits, NEG)
    w = jax.nn.softmax(logits, axis=-1)
    ctx = jnp.einsum(
        "bhqk,bkhd->bqhd", w.astype(v.dtype), v, preferred_element_type=jnp.float32
    )
    return ctx.reshape(b, s, hd).astype(qkv.dtype)


def _inputs(batch=4, seq=16, heads=3, dim=8, segments=2, seed=0, dtype=jnp.float32):
    """Segment ids follow the encoder's contract: unique per (row, segment),
    padded tokens each their own unique negative id."""
    rng = np.random.default_rng(seed)
    qkv = jnp.asarray(rng.normal(size=(batch, seq, 3 * heads * dim)), dtype)
    base = np.repeat(np.arange(segments), -(-seq // segments))[:seq]
    valid = rng.random((batch, seq)) > 0.2
    valid[:, 0] = True
    row = np.arange(batch)[:, None]
    tok = row * seq + np.arange(seq)[None, :]
    seg = np.where(valid, base[None] + row * (seq + 1), -1 - tok)
    bias = jnp.asarray(rng.normal(size=(heads, seq, seq)), jnp.float32)
    return qkv, jnp.asarray(seg, jnp.int32), bias


@pytest.mark.parametrize(
    "batch,seq,heads,dim,segments",
    [
        (4, 16, 3, 8, 1),  # per-row bidirectional (unpacked adapter path)
        (4, 16, 3, 8, 2),  # segment-packed rows (group_ids mechanism)
        (2, 8, 2, 8, 1),  # minimal sublane block, bt = batch
        (3, 24, 4, 16, 3),  # batch not a power of two
        (6, 72, 2, 8, 1),  # the bench-geometry row length (67 padded to 72)
    ],
)
def test_forward_matches_oracle(batch, seq, heads, dim, segments):
    qkv, seg, bias = _inputs(batch, seq, heads, dim, segments)
    ref = _oracle(qkv, seg, bias, heads, dim)
    bias_bd = make_rowtile_bias(bias, batch, seq)
    out = fused_chronos_attention(qkv, seg, bias_bd, heads, dim, True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-5)


def test_gradients_match_oracle_including_bias():
    batch, seq, heads, dim = 4, 16, 3, 8
    qkv, seg, bias = _inputs(batch, seq, heads, dim, segments=2, seed=2)

    def loss_kernel(qkv, bias_hss):
        bias_bd = make_rowtile_bias(bias_hss, batch, seq)
        out = fused_chronos_attention(qkv, seg, bias_bd, heads, dim, True)
        return jnp.sum(out**2)

    def loss_oracle(qkv, bias_hss):
        return jnp.sum(_oracle(qkv, seg, bias_hss, heads, dim) ** 2)

    gq_k, gb_k = jax.grad(loss_kernel, argnums=(0, 1))(qkv, bias)
    gq_o, gb_o = jax.grad(loss_oracle, argnums=(0, 1))(qkv, bias)
    np.testing.assert_allclose(np.asarray(gq_k), np.asarray(gq_o), atol=2e-4, rtol=1e-4)
    # The bias cotangent crosses the in-kernel grid accumulation AND the
    # host-side tile-VJP reduction — exactness here pins both.
    np.testing.assert_allclose(np.asarray(gb_k), np.asarray(gb_o), atol=2e-4, rtol=1e-4)


def test_gradients_match_oracle_bf16():
    batch, seq, heads, dim = 4, 16, 4, 8
    qkv, seg, bias = _inputs(batch, seq, heads, dim, segments=1, seed=3, dtype=jnp.bfloat16)
    g = jnp.asarray(
        np.random.default_rng(4).normal(size=(batch, seq, heads * dim)), jnp.bfloat16
    )
    bias_bd = make_rowtile_bias(bias, batch, seq)

    def run(fn):
        out, vjp = jax.vjp(fn, qkv)
        return out, vjp(g)[0]

    out_k, dq_k = run(
        lambda q: fused_chronos_attention(q, seg, bias_bd, heads, dim, True)
    )
    out_o, dq_o = run(lambda q: _oracle(q, seg, bias, heads, dim))
    np.testing.assert_allclose(
        np.asarray(out_k, np.float32), np.asarray(out_o, np.float32), atol=3e-2
    )
    np.testing.assert_allclose(
        np.asarray(dq_k, np.float32), np.asarray(dq_o, np.float32), atol=6e-2
    )


def test_row_tile_divides_and_caps():
    assert _row_tile(128, 72) == 4  # the bench geometry: 288-row tiles
    assert _row_tile(128, 8) == 32  # cap 288 -> 32 * 8 = 256
    assert _row_tile(3, 16) == 3
    assert _row_tile(7, 512) == 1  # rows beyond the cap degrade to bt=1


def test_gate_is_off_without_tpu():
    assert not supports_chronos_rowtile(72, 12, 64)


@pytest.mark.parametrize("packed", [False, True])
def test_encoder_path_matches_xla_when_forced(monkeypatch, packed):
    """chronos_encoder with the row-tile gate forced on (interpret) equals
    the default XLA path — outputs AND grads (params incl. the trainable
    rel-pos bias, plus the input), on a non-multiple-of-8 row length so the
    padding path is exercised, with key padding and (parametrized) packed
    segment_ids."""
    from multimodal_timesfm_tpu.models import chronos as C
    from multimodal_timesfm_tpu.ops import chronos_attention as CA

    cfg = C.Chronos2Config.tiny()
    params = C.init_chronos_encoder(jax.random.key(0), cfg)
    batch, seq = 4, 10
    x = jax.random.normal(jax.random.key(1), (batch, seq, cfg.model_dim), jnp.float32)
    mask = jnp.ones((batch, seq), jnp.float32).at[:, -2:].set(0.0)
    seg_ids = (
        jnp.broadcast_to(
            jnp.repeat(jnp.arange(2, dtype=jnp.int32), seq // 2)[None], (batch, seq)
        )
        if packed
        else None
    )

    def loss(params, x):
        out = C.chronos_encoder(params, cfg, x, mask, segment_ids=seg_ids)
        # Only VALID positions: the two paths agree there exactly, while
        # invalid-query outputs are intentionally local garbage in the
        # row-tile path (each padded token attends only itself) vs
        # attend-all-valid-keys in the XLA path — downstream consumers
        # (``forward``'s future-token slice) never read them.
        return jnp.sum((out * mask[..., None]) ** 2)

    ref_l, (ref_gp, ref_gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)

    monkeypatch.setattr(CA, "supports_chronos_rowtile", lambda *a: True)
    real = CA.fused_chronos_attention
    monkeypatch.setattr(
        CA,
        "fused_chronos_attention",
        lambda qkv, seg, bias, h, d, interpret=False: real(qkv, seg, bias, h, d, True),
    )
    got_l, (got_gp, got_gx) = jax.value_and_grad(loss, argnums=(0, 1))(params, x)

    np.testing.assert_allclose(float(got_l), float(ref_l), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(got_gx), np.asarray(ref_gx), atol=2e-4)
    flat_ref = jax.tree_util.tree_flatten_with_path(ref_gp)[0]
    flat_got = jax.tree_util.tree_flatten_with_path(got_gp)[0]
    for (path, rg), (_, gg) in zip(flat_ref, flat_got):
        np.testing.assert_allclose(
            np.asarray(gg), np.asarray(rg), atol=3e-4, rtol=2e-4,
            err_msg=jax.tree_util.keystr(path),
        )
