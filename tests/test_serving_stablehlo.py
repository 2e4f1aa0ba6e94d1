"""StableHLO serving export: pure-jax roundtrip parity (no TF needed)."""

import numpy as np

import jax
import jax.numpy as jnp

from multimodal_timesfm_tpu.models.decoder import (
    MultimodalDecoder,
    MultimodalDecoderConfig,
)
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig

def test_stablehlo_export_roundtrip_parity(tmp_path):
    """export_stablehlo -> load_stablehlo parity with the in-process decoder,
    polymorphic batch, weights shipped OUTSIDE the module (not as constants)."""
    from multimodal_timesfm_tpu.serving import export_stablehlo, load_stablehlo

    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(0))
    out_dir = export_stablehlo(
        decoder, params, horizon=8, context_len=16, output_dir=tmp_path / "hlo",
        multimodal=True, full_outputs=True, platforms=("cpu",),
    )
    assert (out_dir / "forecast.stablehlo").exists()
    # Weights travel alongside: the serialized module must stay small (no
    # param constants baked in).
    assert (out_dir / "forecast.stablehlo").stat().st_size < 2_000_000

    serve_fn, manifest = load_stablehlo(out_dir)
    assert manifest["multimodal"] and manifest["horizon"] == 8
    rng = np.random.default_rng(0)
    for batch in (3, 5):  # symbolic batch dim
        ctx = rng.normal(size=(batch, 16)).astype(np.float32)
        txt = rng.normal(size=(batch, 4, 6)).astype(np.float32)
        served = serve_fn(ctx, txt)
        masks = jnp.zeros((batch, 16), bool)
        np.testing.assert_allclose(
            np.asarray(served["point_forecast"]),
            np.asarray(decoder(params, 8, jnp.asarray(ctx), masks, jnp.asarray(txt))),
            atol=1e-5,
        )
        np.testing.assert_allclose(
            np.asarray(served["full_forecast"]),
            np.asarray(decoder.forward_full(params, 8, jnp.asarray(ctx), masks, jnp.asarray(txt))),
            atol=1e-5,
        )


def test_stablehlo_unimodal_and_fresh_params(tmp_path):
    """Unimodal signature takes context only; save_stablehlo_params re-points
    the artifact at new weights (fine-tune without re-lowering) with no
    pickle anywhere in the artifact."""
    from multimodal_timesfm_tpu.serving import (
        export_stablehlo,
        load_stablehlo,
        save_stablehlo_params,
    )

    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(1))
    out_dir = export_stablehlo(
        decoder, params, horizon=8, context_len=16, output_dir=tmp_path / "hlo_uni",
        platforms=("cpu",),
    )
    assert not list(out_dir.glob("*.pkl"))  # npz + json only — safe to load untrusted
    serve_fn, manifest = load_stablehlo(out_dir)
    assert not manifest["multimodal"]
    ctx = np.random.default_rng(2).normal(size=(2, 16)).astype(np.float32)
    first = np.asarray(serve_fn(ctx)["point_forecast"])
    assert first.shape == (2, 8)

    save_stablehlo_params(out_dir, decoder.init(jax.random.key(7)))
    serve_fn2, _ = load_stablehlo(out_dir)
    assert not np.allclose(first, np.asarray(serve_fn2(ctx)["point_forecast"]))

    # Mismatched re-point (different fusion depth -> different leaves) must
    # refuse BEFORE writing — the module was lowered for the exported spec.
    import pytest

    other = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()),
        MultimodalDecoderConfig(text_embedding_dims=6, num_fusion_layers=2,
                                fusion_hidden_dims=[4]),
    )
    with pytest.raises(ValueError, match="do not match the exported"):
        save_stablehlo_params(out_dir, other.init(jax.random.key(8)))
    # artifact untouched: still serves the key-7 weights
    serve_fn3, _ = load_stablehlo(out_dir)
    np.testing.assert_array_equal(
        np.asarray(serve_fn2(ctx)["point_forecast"]),
        np.asarray(serve_fn3(ctx)["point_forecast"]),
    )


def test_stablehlo_chronos_quantile_serving(tmp_path):
    """Chronos backbone exports under a symbolic batch dim (group-ids and
    quantile head included) and serves full quantile channels."""
    from multimodal_timesfm_tpu.models.chronos import Chronos2Adapter, Chronos2Config
    from multimodal_timesfm_tpu.serving import export_stablehlo, load_stablehlo

    decoder = MultimodalDecoder(
        Chronos2Adapter(Chronos2Config.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(3))
    out_dir = export_stablehlo(
        decoder, params, horizon=8, context_len=16, output_dir=tmp_path / "hlo_ch",
        multimodal=True, full_outputs=True, platforms=("cpu",),
    )
    serve_fn, manifest = load_stablehlo(out_dir)
    rng = np.random.default_rng(4)
    ctx = rng.normal(size=(3, 16)).astype(np.float32)
    txt = rng.normal(size=(3, manifest["num_patches"], 6)).astype(np.float32)
    served = serve_fn(ctx, txt)
    masks = jnp.zeros((3, 16), bool)
    np.testing.assert_allclose(
        np.asarray(served["full_forecast"]),
        np.asarray(decoder.forward_full(params, 8, jnp.asarray(ctx), masks, jnp.asarray(txt))),
        atol=1e-5,
    )
    assert np.asarray(served["full_forecast"]).shape[-1] == len(decoder.adapter.config.quantiles)


def test_flatten_refuses_lossy_containers():
    """Trees whose structure can't survive the npz round-trip must refuse at
    flatten time (review finding): tuples come back as lists, non-string dict
    keys as strings, and empty containers vanish — each would export cleanly
    and then fail every serve call with an opaque pytree mismatch."""
    import pytest

    from multimodal_timesfm_tpu.serving import _flatten_params, _unflatten_params

    arr = np.zeros((2, 2), np.float32)
    with pytest.raises(ValueError, match="tuple"):
        _flatten_params({"a": (arr, arr)})
    with pytest.raises(ValueError, match="empty dict"):
        _flatten_params({"a": {"b": arr, "empty": {}}})
    with pytest.raises(ValueError, match="empty list"):
        _flatten_params({"a": [arr], "dead": []})
    with pytest.raises(ValueError, match="not a string"):
        _flatten_params({"a": {0: arr}})

    # the accepted shapes round-trip with IDENTICAL pytree structure
    ok = {"d": {"w": arr, "layers": [{"k": arr}, {"k": arr}]}}
    leaves, spec, lens = _flatten_params(ok)
    rebuilt = _unflatten_params(leaves, spec, lens)
    assert jax.tree.structure(rebuilt) == jax.tree.structure(ok)
