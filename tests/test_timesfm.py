"""Shape/dtype contract and semantics tests for the TimesFM backbone + adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig


@pytest.fixture(scope="module")
def adapter():
    return TimesFM2p5Adapter(TimesFMConfig.tiny())


@pytest.fixture(scope="module")
def params(adapter):
    return adapter.init(jax.random.key(0))


def test_properties(adapter):
    assert adapter.patch_len == 4
    assert adapter.model_dims == 32
    assert adapter.point_forecast_index == 5


def test_preprocess_shapes(adapter, params):
    inputs = jnp.ones((3, 16))
    masks = jnp.zeros((3, 16), bool)
    pre = adapter.preprocess(params, inputs, masks)
    assert pre.input_embeddings.shape == (3, 4, 32)
    assert pre.masks.shape == (3, 4, 4)
    assert pre.normalization_stats["context_mu"].shape == (3, 4)


def test_preprocess_rejects_bad_shapes(adapter, params):
    with pytest.raises(ValueError, match="divisible"):
        adapter.preprocess(params, jnp.ones((2, 15)), jnp.zeros((2, 15), bool))
    with pytest.raises(ValueError, match="masks shape"):
        adapter.preprocess(params, jnp.ones((2, 16)), jnp.zeros((2, 12), bool))


def test_forward_and_postprocess_shapes(adapter, params):
    inputs = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    pre = adapter.preprocess(params, inputs, masks)
    out_emb = adapter.forward(params, pre.input_embeddings, pre.masks)
    assert out_emb.shape == (2, 4, 32)
    preds = adapter.postprocess(params, 8, out_emb, pre.normalization_stats)
    assert preds.shape == (2, 8, 10)


def test_postprocess_rejects_long_horizon(adapter, params):
    out_emb = jnp.zeros((2, 4, 32))
    stats = {"context_mu": jnp.zeros((2, 4)), "context_sigma": jnp.ones((2, 4))}
    with pytest.raises(ValueError, match="output_patch_len"):
        adapter.postprocess(params, 9, out_emb, stats)


def test_causality_of_patch_embeddings(adapter, params):
    """Changing patch k must not affect embeddings of patches < k (running stats are causal)."""
    rng = np.random.default_rng(1)
    base = rng.normal(size=(1, 16)).astype(np.float32)
    pert = base.copy()
    pert[0, 12:] += 100.0  # perturb only the last patch
    masks = jnp.zeros((1, 16), bool)
    emb_a = adapter.preprocess(params, jnp.asarray(base), masks).input_embeddings
    emb_b = adapter.preprocess(params, jnp.asarray(pert), masks).input_embeddings
    np.testing.assert_allclose(np.asarray(emb_a[:, :3]), np.asarray(emb_b[:, :3]), atol=1e-5)
    assert not np.allclose(np.asarray(emb_a[:, 3]), np.asarray(emb_b[:, 3]))


def test_transformer_causality(adapter, params):
    """Attention is causal: perturbing the last patch token leaves earlier outputs unchanged."""
    emb = jnp.asarray(np.random.default_rng(2).normal(size=(1, 4, 32)), jnp.float32)
    masks = jnp.zeros((1, 4, 4), bool)
    out_a = adapter.forward(params, emb, masks)
    out_b = adapter.forward(params, emb.at[:, -1].add(1.0), masks)
    np.testing.assert_allclose(np.asarray(out_a[:, :3]), np.asarray(out_b[:, :3]), atol=1e-5)


def test_padded_keys_are_ignored(adapter, params):
    """Fully-padded leading patches must not influence later positions' outputs."""
    emb = jnp.asarray(np.random.default_rng(3).normal(size=(1, 4, 32)), jnp.float32)
    masks = jnp.zeros((1, 4, 4), bool).at[:, 0].set(True)
    out_a = adapter.forward(params, emb, masks)
    out_b = adapter.forward(params, emb.at[:, 0].add(5.0), masks)
    np.testing.assert_allclose(np.asarray(out_a[:, 1:]), np.asarray(out_b[:, 1:]), atol=1e-5)


def test_jit_compiles_full_pipeline(adapter, params):
    @jax.jit
    def fn(p, x, m):
        pre = adapter.preprocess(p, x, m)
        out = adapter.forward(p, pre.input_embeddings, pre.masks)
        return adapter.postprocess(p, 8, out, pre.normalization_stats)

    preds = fn(params, jnp.ones((2, 16)), jnp.zeros((2, 16), bool))
    assert preds.shape == (2, 8, 10)
    assert np.isfinite(np.asarray(preds)).all()


def test_quantile_head():
    from multimodal_timesfm_tpu.models.timesfm import TimesFMConfig, TimesFM2p5Adapter
    import dataclasses

    cfg = dataclasses.replace(
        TimesFMConfig.tiny(), use_quantile_head=True, quantile_horizon=16
    )
    adapter = TimesFM2p5Adapter(cfg)
    params = adapter.init(jax.random.key(0))
    assert "output_projection_quantiles" in params

    x = jnp.asarray(np.random.default_rng(0).normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    pre = adapter.preprocess(params, x, masks)
    out = adapter.forward(params, pre.input_embeddings, pre.masks)
    q = adapter.postprocess_quantiles(params, 12, out, pre.normalization_stats)
    assert q.shape == (2, 12, 10)
    with pytest.raises(ValueError, match="quantile_horizon"):
        adapter.postprocess_quantiles(params, 17, out, pre.normalization_stats)

    # without the head configured, the method refuses
    base = TimesFM2p5Adapter(TimesFMConfig.tiny())
    bparams = base.init(jax.random.key(0))
    with pytest.raises(ValueError, match="use_quantile_head"):
        base.postprocess_quantiles(bparams, 8, out, pre.normalization_stats)


def test_single_patch_context_matches_general_path():
    """The seq==1 attention shortcut must equal the general softmax path."""
    from multimodal_timesfm_tpu.models import layers as L

    cfg = TimesFMConfig.tiny()
    adapter = TimesFM2p5Adapter(cfg)
    params = adapter.init(jax.random.key(2))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 4)), jnp.float32)  # 1 patch
    masks = jnp.zeros((3, 4), bool)
    pre = adapter.preprocess(params, x, masks)
    out = adapter.forward(params, pre.input_embeddings, pre.masks)

    # general path: run attention explicitly with the XLA implementation
    from multimodal_timesfm_tpu.ops.attention import xla_causal_attention

    layer0 = jax.tree.map(lambda p: p[0], params["stacked_xf"])
    h = L.rms_norm(layer0["attn_norm"], pre.input_embeddings)
    qkv = L.dense(layer0["attn"]["qkv"], h).reshape(3, 1, 3, cfg.num_heads, cfg.head_dim)
    q = L._scale_query(qkv[:, :, 0], layer0["attn"]["per_dim_scale"], cfg.head_dim)
    ref = xla_causal_attention(q, qkv[:, :, 1], qkv[:, :, 2], jnp.ones((3, 1), bool))
    short = L.causal_attention(
        layer0["attn"], h, jnp.zeros((3, 1), bool), cfg.num_heads, cfg.head_dim
    )
    ref_out = L.dense(layer0["attn"]["out"], ref.reshape(3, 1, -1))
    np.testing.assert_allclose(np.asarray(short), np.asarray(ref_out), atol=1e-6)
    assert np.isfinite(np.asarray(out)).all()


def test_remat_matches_default_forward_and_grads():
    """remat=True (jax.checkpoint over the layer scan) is numerically inert."""
    import dataclasses

    import jax.numpy as jnp

    def run(remat):
        cfg = dataclasses.replace(TimesFMConfig.tiny(), remat=remat)
        adapter = TimesFM2p5Adapter(cfg)
        params = adapter.init(jax.random.key(0))
        x = jnp.asarray(np.random.default_rng(0).normal(size=(3, 16)), jnp.float32)
        masks = jnp.zeros((3, 16), bool)

        def loss(p):
            pre = adapter.preprocess(p, x, masks)
            out = adapter.forward(p, pre.input_embeddings, pre.masks)
            preds = adapter.postprocess(p, 8, out, pre.normalization_stats)
            return jnp.sum(preds.astype(jnp.float32) ** 2)

        val, grads = jax.value_and_grad(loss)(params)
        return val, grads

    v0, g0 = run(False)
    v1, g1 = run(True)
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1), rtol=1e-6)
    jax.tree.map(
        # Recompute changes float association; tolerances reflect that.
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5
        ),
        g0,
        g1,
    )


def test_norm_low_precision_paths_match_fp32_oracle():
    """rms_norm/layer_norm keep (..., D)-sized intermediates in x.dtype on
    the low-precision path (the fp32 upcast version stacked two f32[L,B,S,D]
    residual streams per norm under scanned autodiff — docs/PERF.md). The
    bf16 results must stay within bf16 rounding of the fp32 oracle, and the
    backward must produce finite grads with no f32 activation residuals."""
    from multimodal_timesfm_tpu.models import layers as L

    rng = np.random.default_rng(7)
    x = (rng.normal(size=(4, 8, 64)) * 3 + 1.5).astype(np.float32)
    p_rms = {"scale": jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1)}
    p_ln = {
        "scale": jnp.asarray(1 + rng.normal(size=64).astype(np.float32) * 0.1),
        "bias": jnp.asarray(rng.normal(size=64).astype(np.float32) * 0.1),
    }
    for fn, p in [(L.rms_norm, p_rms), (L.layer_norm, p_ln)]:
        oracle = np.asarray(fn(p, jnp.asarray(x)))
        got = np.asarray(fn(p, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32))
        # bf16 eps is 2^-8; inputs span ~±10 so ~0.04 absolute is rounding.
        np.testing.assert_allclose(got, oracle, atol=5e-2)
        assert fn(p, jnp.asarray(x, jnp.bfloat16)).dtype == jnp.bfloat16

        grads = jax.grad(
            lambda pp: fn(pp, jnp.asarray(x, jnp.bfloat16)).astype(jnp.float32).sum()
        )(p)
        assert all(bool(jnp.isfinite(g).all()) for g in jax.tree.leaves(grads))


def test_norm_small_learned_gains_affect_bf16_forward():
    """The learned norm scale must be applied in fp32 with one final cast:
    a gain of 1.003 — which bf16 CANNOT represent (it rounds to exactly 1.0,
    so casting the gain before the multiply makes it a coherent no-op) — has
    to move a healthy fraction of output elements through the final rounding
    (round-4 review finding: small learned gains must not silently vanish)."""
    from multimodal_timesfm_tpu.models import layers as L

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(8, 16, 64)) * 2, jnp.bfloat16)

    base = np.asarray(L.rms_norm({"scale": jnp.zeros((64,))}, x).astype(jnp.float32))
    nudged = np.asarray(
        L.rms_norm({"scale": jnp.full((64,), 3e-3, jnp.float32)}, x).astype(jnp.float32)
    )
    assert np.mean(base != nudged) > 0.3, "3e-3 rms_norm gain had (almost) no forward effect"

    p0 = {"scale": jnp.ones((64,)), "bias": jnp.zeros((64,))}
    p1 = {"scale": jnp.full((64,), 1.003, jnp.float32), "bias": jnp.zeros((64,))}
    base = np.asarray(L.layer_norm(p0, x).astype(jnp.float32))
    nudged = np.asarray(L.layer_norm(p1, x).astype(jnp.float32))
    assert np.mean(base != nudged) > 0.3, "1.003 layer_norm gain had (almost) no forward effect"


def test_residual_lean_relu_matches_jax_nn_relu_exactly():
    """layers.relu recomputes the pred mask from its saved output in backward
    (dropping the bool residual stack through scanned layers — docs/PERF.md);
    its value AND gradient must be bit-identical to jax.nn.relu, including the
    zero-gradient-at-0 convention."""
    from multimodal_timesfm_tpu.models import layers as L

    rng = np.random.default_rng(3)
    x = rng.normal(size=(64,)).astype(np.float32)
    x[::7] = 0.0  # exercise the tie point explicitly
    for dt in (jnp.float32, jnp.bfloat16):
        xj = jnp.asarray(x, dt)
        np.testing.assert_array_equal(np.asarray(L.relu(xj)), np.asarray(jax.nn.relu(xj)))
        g0 = jax.grad(lambda v: (jax.nn.relu(v) * jnp.asarray(x, dt)).sum())(xj)
        g1 = jax.grad(lambda v: (L.relu(v) * jnp.asarray(x, dt)).sum())(xj)
        np.testing.assert_array_equal(np.asarray(g0), np.asarray(g1))


def test_softmax_lowp_forward_exact_backward_within_rounding():
    """ops.attention.softmax_lowp forward equals softmax().astype(dtype) exactly;
    its backward (evaluated from the saved low-precision weights instead of an
    fp32 probs residual) stays within the output dtype's rounding of the
    composed gradient, and masked (-inf) columns get exactly zero gradient."""
    from multimodal_timesfm_tpu.ops.attention import softmax_lowp

    rng = np.random.default_rng(5)
    logits = (rng.normal(size=(2, 3, 8, 8)) * 4).astype(np.float32)
    logits[..., -2:] = np.float32(np.finfo(np.float32).min)  # masked keys
    lj = jnp.asarray(logits)

    for dt, atol in ((jnp.float32, 1e-6), (jnp.bfloat16, 2e-2)):
        np.testing.assert_array_equal(
            np.asarray(softmax_lowp(lj, dt)),
            np.asarray(jax.nn.softmax(lj, axis=-1).astype(dt)),
        )
        cot = jnp.asarray(rng.normal(size=logits.shape).astype(np.float32), dt)
        g_ref = jax.grad(
            lambda l: (jax.nn.softmax(l, axis=-1).astype(dt) * cot).astype(jnp.float32).sum()
        )(lj)
        g_new = jax.grad(
            lambda l: (softmax_lowp(l, dt) * cot).astype(jnp.float32).sum()
        )(lj)
        assert g_new.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(g_new), np.asarray(g_ref), atol=atol)
        assert np.all(np.asarray(g_new)[..., -2:] == 0.0)


def test_scanned_backward_has_no_bool_or_f32_probs_residual_stacks():
    """Regression for the residual-lean ops: the grad jaxpr of a scanned bf16
    transformer stack must carry NO bool[L, ...] pred-mask stack at the ffn
    width and NO f32[L, B, H, S, S] attention-probs stack — only bf16 copies
    shared with the matmul residuals (docs/PERF.md, round-3/4 fixes)."""
    import re

    from multimodal_timesfm_tpu.models import layers as L

    # LYR distinct from every other dim so a leading-LYR shape in the jaxpr
    # text is unambiguously a residual stacked through the scan.
    LYR, B, S, D, H, HD, F = 3, 2, 16, 32, 2, 16, 64
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        L.init_stacked_layers(jax.random.key(0), LYR, D, H, HD, F),
    )
    x = jnp.asarray(np.random.default_rng(0).normal(size=(B, S, D)), jnp.bfloat16)
    pad = jnp.zeros((B, S), bool)

    def loss(p):
        return L.stacked_transformer(p, x, pad, H, HD).astype(jnp.float32).sum()

    text = str(jax.make_jaxpr(jax.grad(loss))(params))
    # Any L-leading bool stack is the relu pred mask (or a re-stacked where
    # mask); none should survive.
    assert not re.search(rf"bool\[{LYR},", text), "a bool residual stack is back"
    # Any L-leading f32 stack ending in (S, S) is the fp32 softmax residual.
    assert not re.search(rf"f32\[{LYR},[0-9,]*{S},{S}\]", text), "fp32 probs stack is back"
    # Any L-leading f32 stack at (B, S, D) or (B, S, F) is a norm/activation
    # fp32 upcast residual — the +20.8%-baseline r3 fix (docs/PERF.md). Only
    # the (B, S, 1) variance/inverse-scale stacks may be fp32.
    assert not re.search(rf"f32\[{LYR},{B},{S},{D}\]", text), "norm f32 residual stack is back"
    assert not re.search(rf"f32\[{LYR},{B},{S},{F}\]", text), "ffn f32 residual stack is back"
