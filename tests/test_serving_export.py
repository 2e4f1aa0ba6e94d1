"""SavedModel export: reload via TensorFlow and check parity with the JAX forward."""

import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")
pytest.importorskip("orbax.export")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from multimodal_timesfm_tpu.models.decoder import (  # noqa: E402
    MultimodalDecoder,
    MultimodalDecoderConfig,
)
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig  # noqa: E402
from multimodal_timesfm_tpu.serving import export_saved_model  # noqa: E402


def test_export_and_reload_parity(tmp_path):
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(0))
    out_dir = export_saved_model(
        decoder, params, horizon=8, context_len=16, output_dir=tmp_path / "sm",
        multimodal=True, full_outputs=True,
    )

    loaded = tf.saved_model.load(str(out_dir))
    rng = np.random.default_rng(0)
    for batch in (3, 5):  # polymorphic batch dim
        ctx = rng.normal(size=(batch, 16)).astype(np.float32)
        txt = rng.normal(size=(batch, 4, 6)).astype(np.float32)
        served = loaded.signatures["serving_default"](
            context=tf.constant(ctx), text_embeddings=tf.constant(txt)
        )
        masks = jnp.zeros((batch, 16), bool)
        expected_point = decoder(params, 8, jnp.asarray(ctx), masks, jnp.asarray(txt))
        expected_full = decoder.forward_full(params, 8, jnp.asarray(ctx), masks, jnp.asarray(txt))
        np.testing.assert_allclose(
            served["point_forecast"].numpy(), np.asarray(expected_point), atol=1e-5
        )
        np.testing.assert_allclose(
            served["full_forecast"].numpy(), np.asarray(expected_full), atol=1e-5
        )


def test_export_unimodal_signature(tmp_path):
    decoder = MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()), MultimodalDecoderConfig(text_embedding_dims=6)
    )
    params = decoder.init(jax.random.key(1))
    out_dir = export_saved_model(
        decoder, params, horizon=8, context_len=16, output_dir=tmp_path / "sm_uni"
    )
    loaded = tf.saved_model.load(str(out_dir))
    sig = loaded.signatures["serving_default"]
    assert set(sig.structured_input_signature[1]) == {"context"}
    out = sig(context=tf.zeros((2, 16)))
    assert out["point_forecast"].shape == (2, 8)
