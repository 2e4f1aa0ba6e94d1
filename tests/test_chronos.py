"""Shape/semantics tests for the Chronos-2 backbone + adapter."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from multimodal_timesfm_tpu.models.chronos import (
    Chronos2Adapter,
    Chronos2Config,
    instance_norm_inverse,
    instance_norm_stats,
)
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig


@pytest.fixture(scope="module")
def adapter():
    return Chronos2Adapter(Chronos2Config.tiny())


@pytest.fixture(scope="module")
def params(adapter):
    return adapter.init(jax.random.key(0))


def test_properties(adapter):
    assert adapter.patch_len == 4
    assert adapter.model_dims == 32
    assert adapter.point_forecast_index == 4  # 0.5 in the decile list


def test_instance_norm_stats_masked():
    x = jnp.array([[1.0, 2.0, 3.0, 100.0]])
    valid = jnp.array([[1.0, 1.0, 1.0, 0.0]])
    loc, scale = instance_norm_stats(x, valid)
    np.testing.assert_allclose(np.asarray(loc), [[2.0]], atol=1e-6)
    np.testing.assert_allclose(np.asarray(scale), [[np.sqrt(2 / 3)]], atol=1e-6)
    back = instance_norm_inverse((x - loc) / scale, loc, scale)
    np.testing.assert_allclose(np.asarray(back), np.asarray(x), atol=1e-5)


def test_instance_norm_constant_series():
    x = jnp.full((1, 8), 5.0)
    loc, scale = instance_norm_stats(x, jnp.ones((1, 8)))
    assert float(scale[0, 0]) == 1.0  # degenerate scale -> 1.0


def test_preprocess_shapes_and_mask_flip(adapter, params):
    inputs = jnp.ones((2, 16))
    masks = jnp.zeros((2, 16), bool).at[:, :4].set(True)  # first patch padded
    pre = adapter.preprocess(params, inputs, masks)
    assert pre.input_embeddings.shape == (2, 4, 32)
    assert pre.masks.shape == (2, 4)
    assert bool(pre.masks[0, 0]) and not bool(pre.masks[0, 1])
    assert pre.normalization_stats["loc"].shape == (2, 1)


def test_forward_appends_future_and_reg(adapter, params):
    emb = jnp.asarray(np.random.default_rng(0).normal(size=(2, 4, 32)), jnp.float32)
    masks = jnp.zeros((2, 4), bool)
    out = adapter.forward(params, emb, masks)
    assert out.shape == (2, 4, 32)  # max_output_patches hidden states


def test_postprocess_shapes_and_denorm(adapter, params):
    out_emb = jnp.asarray(np.random.default_rng(1).normal(size=(2, 4, 32)), jnp.float32)
    stats = {"loc": jnp.array([[10.0], [0.0]]), "scale": jnp.array([[2.0], [1.0]])}
    preds = adapter.postprocess(params, 8, out_emb, stats)
    assert preds.shape == (2, 8, 9)
    # denormalization applied: sample 0 shifted by loc=10
    zero_stats = {"loc": jnp.zeros((2, 1)), "scale": jnp.ones((2, 1))}
    raw = adapter.postprocess(params, 8, out_emb, zero_stats)
    np.testing.assert_allclose(np.asarray(preds[0]), np.asarray(raw[0]) * 2.0 + 10.0, atol=1e-4)


def test_postprocess_horizon_guard(adapter, params):
    out_emb = jnp.zeros((1, 4, 32))
    stats = {"loc": jnp.zeros((1, 1)), "scale": jnp.ones((1, 1))}
    with pytest.raises(ValueError, match="exceeds the maximum"):
        adapter.postprocess(params, 17, out_emb, stats)


def test_padded_context_patches_ignored(adapter, params):
    """Fully padded context patches must not change the forecast positions."""
    rng = np.random.default_rng(2)
    emb = jnp.asarray(rng.normal(size=(1, 4, 32)), jnp.float32)
    masks = jnp.zeros((1, 4), bool).at[:, 0].set(True)
    out_a = adapter.forward(params, emb, masks)
    out_b = adapter.forward(params, emb.at[:, 0].add(7.0), masks)
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-5)


def test_full_decoder_pipeline_with_chronos(adapter, params):
    decoder = MultimodalDecoder(adapter, MultimodalDecoderConfig(text_embedding_dims=6))
    dec_params = {"adapter": params, "fusion": decoder.init(jax.random.key(1))["fusion"]}
    x = jnp.asarray(np.random.default_rng(3).normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    text = jnp.asarray(np.random.default_rng(4).normal(size=(2, 4, 6)), jnp.float32)
    point = decoder(dec_params, 8, x, masks, text)
    assert point.shape == (2, 8)
    assert np.isfinite(np.asarray(point)).all()


def test_jit_full_pipeline(adapter, params):
    decoder = MultimodalDecoder(adapter, MultimodalDecoderConfig(text_embedding_dims=6))
    dec_params = decoder.init(jax.random.key(5))

    @jax.jit
    def fn(p, x, m):
        return decoder(p, 8, x, m, None)

    out = fn(dec_params, jnp.ones((2, 16)), jnp.zeros((2, 16), bool))
    assert out.shape == (2, 8)
    assert np.isfinite(np.asarray(out)).all()


def test_segment_packing_isolates_groups(adapter, params):
    """Packed segments must not attend across segment boundaries."""
    import jax.numpy as jnp
    from multimodal_timesfm_tpu.models.chronos import chronos_encoder

    rng = np.random.default_rng(5)
    x = jnp.asarray(rng.normal(size=(1, 8, 32)), jnp.float32)
    mask = jnp.ones((1, 8))
    seg = jnp.asarray([[0, 0, 0, 0, 1, 1, 1, 1]])
    out_a = chronos_encoder(params["encoder"], adapter.config, x, mask, seg)
    # perturb segment 1; segment 0 outputs must be unchanged
    x2 = x.at[:, 4:].add(5.0)
    out_b = chronos_encoder(params["encoder"], adapter.config, x2, mask, seg)
    np.testing.assert_allclose(np.asarray(out_a[:, :4]), np.asarray(out_b[:, :4]), atol=1e-5)
    # without segments, segment-0 outputs DO change
    out_c = chronos_encoder(params["encoder"], adapter.config, x, mask)
    out_d = chronos_encoder(params["encoder"], adapter.config, x2, mask)
    assert not np.allclose(np.asarray(out_c[:, :4]), np.asarray(out_d[:, :4]), atol=1e-5)


def test_packed_forward_equals_per_row(adapter, params):
    """pack=k through the adapter is numerically identical to per-row attention.

    This is the upstream ``group_ids`` contract made real: each series is its
    own attention group whether it occupies its own row (reference
    ``chronos.py:117-123``, our default) or a segment of a packed row.
    """
    rng = np.random.default_rng(7)
    inputs = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    masks = jnp.zeros((4, 16), bool).at[3, :8].set(True)  # one partially padded row

    pre = adapter.preprocess(params, inputs, masks)
    per_row = adapter.forward(params, pre.input_embeddings, pre.masks)
    packed2 = adapter.forward(params, pre.input_embeddings, pre.masks, pack=2)
    packed4 = adapter.forward(params, pre.input_embeddings, pre.masks, pack=4)

    np.testing.assert_allclose(np.asarray(packed2), np.asarray(per_row), atol=1e-5)
    np.testing.assert_allclose(np.asarray(packed4), np.asarray(per_row), atol=1e-5)


def test_packed_forward_validates_divisibility(adapter, params):
    pre = adapter.preprocess(params, jnp.ones((3, 16)), jnp.zeros((3, 16), bool))
    with pytest.raises(ValueError, match="divisible"):
        adapter.forward(params, pre.input_embeddings, pre.masks, pack=2)


def test_max_output_patches_changes_numerics_vs_checkpoint_default():
    """mop is a fine-tune-time speed knob, NOT checkpoint-equivalent.

    With bidirectional attention the dropped future patches were attention
    keys for the kept ones, so shrinking ``max_output_patches`` changes the
    outputs even on shared weights. Parity evals against a pretrained
    checkpoint must pin mop to the checkpoint's own value (PARITY.md
    "max_output_patches semantics"; reference always runs all future patches,
    ``chronos.py:78-99``).
    """
    import dataclasses

    cfg_full = Chronos2Config.tiny()  # mop=4
    cfg_short = dataclasses.replace(cfg_full, max_output_patches=2)
    a_full = Chronos2Adapter(cfg_full)
    a_short = Chronos2Adapter(cfg_short)
    shared = a_full.init(jax.random.key(1))  # params are mop-independent

    rng = np.random.default_rng(11)
    inputs = jnp.asarray(rng.normal(size=(2, 16)), jnp.float32)
    masks = jnp.zeros((2, 16), bool)
    horizon = 8  # <= both mop * output_patch_size

    def run(adapter):
        pre = adapter.preprocess(shared, inputs, masks)
        hidden = adapter.forward(shared, pre.input_embeddings, pre.masks)
        return adapter.postprocess(shared, horizon, hidden, pre.normalization_stats)

    out_full, out_short = np.asarray(run(a_full)), np.asarray(run(a_short))
    assert out_full.shape == out_short.shape == (2, horizon, 9)
    assert not np.allclose(out_full, out_short, atol=1e-4)


def test_config_pack_knob_matches_unpacked():
    """cfg.pack as the forward default == explicit pack=1 (numerically)."""
    import dataclasses

    cfg = Chronos2Config.tiny()
    packed_adapter = Chronos2Adapter(dataclasses.replace(cfg, pack=2))
    plain_adapter = Chronos2Adapter(cfg)
    params = plain_adapter.init(jax.random.key(0))
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(4, 16)), jnp.float32)
    masks = jnp.zeros((4, 16), bool)

    pre = plain_adapter.preprocess(params, x, masks)
    plain = plain_adapter.forward(params, pre.input_embeddings, pre.masks)
    packed = packed_adapter.forward(params, pre.input_embeddings, pre.masks)
    np.testing.assert_allclose(np.asarray(packed), np.asarray(plain), atol=1e-5)


def test_remat_numerically_identical():
    """cfg.remat=True (checkpointed encoder layers) changes scheduling only:
    forward outputs and gradients match the default path."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config

    rng = np.random.default_rng(0)
    ctx = jnp.asarray(rng.normal(size=(3, 16)), jnp.float32)
    masks = jnp.zeros((3, 16), bool)

    cfg = Chronos2Config.tiny()
    adapter = Chronos2Adapter(cfg)
    params = adapter.init(jax.random.key(0))
    adapter_r = Chronos2Adapter(dataclasses.replace(cfg, remat=True))

    def loss(a):
        def f(p):
            pre = a.preprocess(p, ctx, masks)
            out = a.forward(p, pre.input_embeddings, pre.masks)
            return jnp.sum(a.postprocess(p, 8, out, pre.normalization_stats) ** 2)

        return f

    v0, g0 = jax.value_and_grad(loss(adapter))(params)
    v1, g1 = jax.value_and_grad(loss(adapter_r))(params)
    np.testing.assert_allclose(float(v0), float(v1), rtol=1e-6)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5),
        g0,
        g1,
    )
