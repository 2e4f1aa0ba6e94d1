"""fold_frozen_affines: folding frozen norm gains / query scale into GEMMs.

For a frozen backbone the RMS-norm gain, the PAX per-dim query scale, and the
LayerNorm affine are exact linear rewrites of the adjacent projection weights
(models/layers.fold_frozen_affines) — valid at ANY sequence length, unlike
the seq==1 v+out fold. These tests pin output and input-gradient parity, the
composition with the seq==1 fold, idempotence, and the trainer gating.
"""

import numpy as np
import jax
import jax.numpy as jnp

from multimodal_timesfm_tpu.models import layers as L
from multimodal_timesfm_tpu.models.timesfm import TimesFMConfig

from tests.test_fold_seq1 import _trainer


def _perturbed_stack(seed=1, num_layers=None):
    """Tiny stack with NONZERO norm gains / biases / per-dim scale so the
    folds are actually exercised (the zero inits make them no-ops)."""
    cfg = TimesFMConfig.tiny()
    stacked = L.init_stacked_layers(
        jax.random.key(seed),
        num_layers or cfg.num_layers,
        cfg.model_dims,
        cfg.num_heads,
        cfg.head_dim,
        cfg.ffn_dims,
    )
    rng = np.random.default_rng(seed)

    def perturb(x):
        return x + jnp.asarray(rng.normal(scale=0.05, size=x.shape), x.dtype)

    for key in ("attn_norm", "ffn_norm"):
        stacked[key] = jax.tree.map(perturb, stacked[key])
    stacked["attn"]["per_dim_scale"] = perturb(stacked["attn"]["per_dim_scale"])
    stacked["attn"]["qkv"]["bias"] = perturb(stacked["attn"]["qkv"]["bias"])
    stacked["ffn_up"]["bias"] = perturb(stacked["ffn_up"]["bias"])
    return cfg, stacked


def test_folded_forward_and_input_grad_match_multi_token():
    cfg, stacked = _perturbed_stack()
    folded = L.fold_frozen_affines(stacked)
    assert folded["attn_norm"] == {} and folded["ffn_norm"] == {}
    assert "per_dim_scale" not in folded["attn"]

    x = jax.random.normal(jax.random.key(2), (4, 6, cfg.model_dims), jnp.float32)
    pad = jnp.zeros((4, 6), bool).at[:, -1].set(True)  # exercise key masking

    def run(params, x):
        return L.stacked_transformer(params, x, pad, cfg.num_heads, cfg.head_dim)

    ref = run(stacked, x)
    got = run(folded, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)

    # input gradients (the only gradients a frozen stack propagates)
    gref = jax.grad(lambda x: run(stacked, x).sum())(x)
    ggot = jax.grad(lambda x: run(folded, x).sum())(x)
    np.testing.assert_allclose(np.asarray(ggot), np.asarray(gref), rtol=2e-4, atol=2e-5)


def test_fold_composes_with_seq1_fold_both_orders():
    cfg, stacked = _perturbed_stack(seed=3)
    x = jax.random.normal(jax.random.key(4), (5, 1, cfg.model_dims), jnp.float32)
    pad = jnp.zeros((5, 1), bool)

    def run(params):
        return np.asarray(
            L.stacked_transformer(params, x, pad, cfg.num_heads, cfg.head_dim)
        )

    ref = run(stacked)
    a = L.fold_frozen_affines(L.fold_seq1_attention(stacked))  # seq1 first
    b = L.fold_seq1_attention(L.fold_frozen_affines(stacked))  # affine first
    assert "vo" in a["attn"] and "vo" in b["attn"]
    np.testing.assert_allclose(run(a), ref, rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(run(b), ref, rtol=2e-5, atol=2e-5)


def test_fold_is_idempotent():
    _, stacked = _perturbed_stack(seed=5)
    folded = L.fold_frozen_affines(stacked)
    again = L.fold_frozen_affines(folded)
    jax.tree.map(
        lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
        folded,
        again,
    )


def test_tree_fold_returns_none_for_non_timesfm_shapes():
    assert L.fold_frozen_tree_affines({"adapter": {"encoder": {}}}) is None


def test_trainer_gating(tmp_path):
    # multimodal: folds; the frozen stack's norms are emptied.
    _, _, folded = _trainer(tmp_path / "a")
    assert folded._folded_affine
    stack = folded.frozen["adapter"]["stacked_xf"]
    assert stack["attn_norm"] == {} and stack["ffn_norm"] == {}

    # baseline mode trains the backbone: the affines are parameters, no fold.
    _, _, baseline = _trainer(tmp_path / "b", mode="baseline")
    assert not baseline._folded_affine
    bstack = baseline.state.trainable["stacked_xf"]
    assert "scale" in bstack["attn_norm"]


def test_trainer_folded_matches_unfolded_training(tmp_path):
    from multimodal_timesfm_tpu.data.dataset import PreprocessedDataset
    from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
    from tests.test_fold_seq1 import _args, _samples

    _, _, folded = _trainer(tmp_path / "a")
    # Same decoder/data/seed with the affine fold disabled (the helper
    # doesn't expose the flag, so build the control trainer directly).
    decoder = folded.model
    params = decoder.init(jax.random.key(0))
    samples = _samples(16, 0, True) + _samples(8, 1, True)
    plain = MultimodalTrainer(
        model=decoder,
        params=params,
        args=_args(tmp_path / "b"),
        train_dataset=PreprocessedDataset(samples[:16], "multimodal"),
        val_dataset=PreprocessedDataset(samples[16:], "multimodal"),
        mode="multimodal",
        fold_frozen_seq1=True,
        fold_frozen_affine=False,
    )
    assert folded._folded_affine and not plain._folded_affine
    folded.train()
    plain.train()
    np.testing.assert_allclose(
        np.asarray(folded.best_val_loss), np.asarray(plain.best_val_loss), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6
        ),
        folded.state.trainable,
        plain.state.trainable,
    )
