"""fold_seq1_attention: frozen v+out folding for single-patch-token training.

At seq==1 causal attention is the identity over one key, so the block is two
back-to-back linear maps; the trainer pre-multiplies them for the FROZEN
backbone in multimodal mode (the reference-default 32/32 geometry — the
headline bench path). These tests pin exactness, the loud seq>1 failure, and
the trainer gating.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multimodal_timesfm_tpu.data.dataset import PreprocessedDataset
from multimodal_timesfm_tpu.models import layers as L
from multimodal_timesfm_tpu.models.decoder import MultimodalDecoder, MultimodalDecoderConfig
from multimodal_timesfm_tpu.models.timesfm import TimesFM2p5Adapter, TimesFMConfig
from multimodal_timesfm_tpu.training.trainer import MultimodalTrainer
from multimodal_timesfm_tpu.training_args import TrainingArguments
from multimodal_timesfm_tpu.types import PreprocessedSample

CONTEXT, HORIZON, TEXT_DIMS = 4, 8, 6  # patch_len 4 -> ONE patch token


def _samples(n, seed, with_text=True):
    rng = np.random.default_rng(seed)
    out = []
    for i in range(n):
        s = PreprocessedSample(
            context=rng.normal(size=CONTEXT).astype(np.float32),
            horizon=rng.normal(size=HORIZON).astype(np.float32),
            metadata={"i": i},
        )
        if with_text:
            s["text_embeddings"] = rng.normal(size=(1, TEXT_DIMS)).astype(np.float32)
        out.append(s)
    return out


def _decoder():
    return MultimodalDecoder(
        TimesFM2p5Adapter(TimesFMConfig.tiny()),
        MultimodalDecoderConfig(text_embedding_dims=TEXT_DIMS),
    )


def _args(tmp_path, **kw):
    defaults = dict(
        output_dir=str(tmp_path / "out"),
        per_device_train_batch_size=8,
        per_device_eval_batch_size=8,
        num_train_epochs=2,
        learning_rate=1e-2,
        eval_strategy="epoch",
        save_strategy="no",
        logging_strategy="epoch",
        seed=0,
    )
    defaults.update(kw)
    return TrainingArguments(**defaults)


def _trainer(tmp_path, mode="multimodal", fold=True, context=CONTEXT, cast=None, **args_kw):
    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    with_text = mode == "multimodal"
    rng = np.random.default_rng(3)
    samples = _samples(16, 0, with_text) + _samples(8, 1, with_text)
    if context != CONTEXT:  # widen the windows for the gating test
        for s in samples:
            s["context"] = rng.normal(size=context).astype(np.float32)
            if with_text:
                s["text_embeddings"] = rng.normal(size=(context // 4, TEXT_DIMS)).astype(
                    np.float32
                )
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=_args(tmp_path, **args_kw),
        train_dataset=PreprocessedDataset(samples[:16], mode),
        val_dataset=PreprocessedDataset(samples[16:], mode),
        mode=mode,
        fold_frozen_seq1=fold,
        frozen_cast_dtype=cast,
    )
    return decoder, params, trainer


def test_folded_forward_matches_unfolded_exactly_at_seq1():
    cfg = TimesFMConfig.tiny()
    stacked = L.init_stacked_layers(
        jax.random.key(1), cfg.num_layers, cfg.model_dims, cfg.num_heads, cfg.head_dim, cfg.ffn_dims
    )
    # make biases nonzero so the bias fold is actually exercised
    stacked = jax.tree.map(
        lambda x: x + 0.01 if x.ndim <= 2 else x, stacked
    )
    folded = L.fold_seq1_attention(stacked)
    x = jax.random.normal(jax.random.key(2), (8, 1, cfg.model_dims), jnp.float32)
    pad = jnp.zeros((8, 1), bool)
    ref = L.stacked_transformer(stacked, x, pad, cfg.num_heads, cfg.head_dim)
    got = L.stacked_transformer(folded, x, pad, cfg.num_heads, cfg.head_dim)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_folded_attention_raises_beyond_one_token():
    cfg = TimesFMConfig.tiny()
    stacked = L.init_stacked_layers(
        jax.random.key(1), cfg.num_layers, cfg.model_dims, cfg.num_heads, cfg.head_dim, cfg.ffn_dims
    )
    folded = L.fold_seq1_attention(stacked)
    x = jnp.zeros((2, 3, cfg.model_dims), jnp.float32)
    pad = jnp.zeros((2, 3), bool)
    with pytest.raises(ValueError, match="folded for seq==1"):
        L.stacked_transformer(folded, x, pad, cfg.num_heads, cfg.head_dim)


def test_trainer_folds_and_matches_unfolded_trajectory(tmp_path):
    _, _, folded = _trainer(tmp_path / "a", fold=True)
    _, _, plain = _trainer(tmp_path / "b", fold=False)
    assert folded._folded_seq1 and not plain._folded_seq1
    assert "vo" in folded.frozen["adapter"]["stacked_xf"]["attn"]
    assert "qkv" in plain.frozen["adapter"]["stacked_xf"]["attn"]
    folded.train()
    plain.train()
    # identical data/seed; the fold reassociates one fp32 matmul chain
    np.testing.assert_allclose(
        np.asarray(folded.best_val_loss), np.asarray(plain.best_val_loss), rtol=1e-5
    )
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-6),
        folded.state.trainable,
        plain.state.trainable,
    )


def test_fold_composes_with_bf16_frozen_cast(tmp_path):
    """The bench path: fold in fp32 FIRST, then cast the frozen tree to bf16.

    Pins the composition order (trainer.py folds before frozen_cast_dtype
    applies; fold_seq1_attention fp32-accumulates even on bf16-stored trees)
    and that the folded bf16 program tracks the unfolded bf16 program within
    bf16 rounding — the reassociated product is the only difference.
    """
    _, _, folded = _trainer(tmp_path / "a", fold=True, cast=jnp.bfloat16)
    _, _, plain = _trainer(tmp_path / "b", fold=False, cast=jnp.bfloat16)
    assert folded._folded_seq1 and not plain._folded_seq1
    vo = folded.frozen["adapter"]["stacked_xf"]["attn"]["vo"]["kernel"]
    assert vo.dtype == jnp.bfloat16  # cast applied AFTER the fp32 fold
    folded.train()
    plain.train()
    np.testing.assert_allclose(
        np.asarray(folded.best_val_loss), np.asarray(plain.best_val_loss), rtol=2e-2
    )


def _stacked_dict(samples):
    from multimodal_timesfm_tpu.data.collate import StackedDataset

    d = StackedDataset(
        context=np.stack([s["context"] for s in samples]),
        horizon=np.stack([s["horizon"] for s in samples]),
        text_embeddings=np.stack([s["text_embeddings"] for s in samples]),
        metadata=[{}] * len(samples),
    )
    return {"context": d.context, "horizon": d.horizon, "text": d.text_embeddings}


def test_vectorized_trials_fold_matches_unfolded():
    """The sweep driver's frozen-tree fold reproduces the unfolded trials."""
    from multimodal_timesfm_tpu.training.vectorized import (
        evaluate_vectorized,
        run_vectorized_trials,
        stack_trainables,
    )

    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    frozen = {k: v for k, v in params.items() if k != "fusion"}
    folded = L.fold_frozen_tree_seq1(frozen)
    assert folded is not None
    assert "vo" in folded["adapter"]["stacked_xf"]["attn"]
    train_d = _stacked_dict(_samples(16, 0))
    val_d = _stacked_dict(_samples(8, 1))
    def inits():  # run_vectorized_trials donates the init buffers
        return jax.tree.map(np.asarray, stack_trainables([params["fusion"]] * 2))

    hp = {
        "learning_rate": np.asarray([1e-2, 3e-3]),
        "weight_decay": np.asarray([0.01, 0.0]),
        "warmup_steps": np.asarray([1.0, 0.0]),
    }
    kw = dict(horizon_len=HORIZON, batch_size=8, num_epochs=2, scheduler="linear", seed=0)
    ref = run_vectorized_trials(decoder, frozen, inits(), train_d, val_d, hp, **kw)
    got = run_vectorized_trials(decoder, folded, inits(), train_d, val_d, hp, **kw)
    np.testing.assert_allclose(got.val_losses, ref.val_losses, rtol=1e-5)
    np.testing.assert_allclose(got.best_val, ref.best_val, rtol=1e-5)
    jax.tree.map(
        lambda a, b: np.testing.assert_allclose(a, b, rtol=1e-4, atol=1e-6),
        got.best_trainable,
        ref.best_trainable,
    )
    test_d = _stacked_dict(_samples(8, 2))
    mse_r, mae_r = evaluate_vectorized(
        decoder, frozen, ref.best_trainable, test_d, horizon_len=HORIZON, batch_size=8
    )
    mse_f, mae_f = evaluate_vectorized(
        decoder, folded, ref.best_trainable, test_d, horizon_len=HORIZON, batch_size=8
    )
    np.testing.assert_allclose(mse_f, mse_r, rtol=1e-5)
    np.testing.assert_allclose(mae_f, mae_r, rtol=1e-5)


def test_fold_frozen_tree_returns_none_for_non_timesfm_shapes():
    # Chronos-shaped adapter tree (no stacked_xf) and a fusion-only tree
    assert L.fold_frozen_tree_seq1({"adapter": {"encoder": {}}}) is None
    assert L.fold_frozen_tree_seq1({"other": 1}) is None


def test_fold_gating(tmp_path):
    # baseline mode trains the factors: never folded
    _, _, t = _trainer(tmp_path / "bl", mode="baseline", fold=True)
    assert not t._folded_seq1
    # multi-token contexts: not foldable
    _, _, t = _trainer(tmp_path / "wide", fold=True, context=8)
    assert not t._folded_seq1
    assert "qkv" in t.frozen["adapter"]["stacked_xf"]["attn"]


def test_fold_skipped_under_tensor_parallel_sharding(tmp_path):
    """TP sharding rules key on qkv/out factor names: the fold must yield."""
    from multimodal_timesfm_tpu.parallel.mesh import MeshConfig, make_mesh
    from multimodal_timesfm_tpu.parallel.sharding import shard_params

    decoder = _decoder()
    params = decoder.init(jax.random.key(0))
    samples = _samples(16, 0)
    mesh = make_mesh(MeshConfig(data_parallel=4, model_parallel=2))
    trainer = MultimodalTrainer(
        model=decoder,
        params=params,
        args=_args(tmp_path),
        train_dataset=PreprocessedDataset(samples[:12], "multimodal"),
        val_dataset=PreprocessedDataset(samples[12:], "multimodal"),
        mode="multimodal",
        mesh=mesh,
        shard_params_fn=shard_params,
        fold_frozen_seq1=True,
    )
    assert not trainer._folded_seq1
    assert "qkv" in trainer.frozen["adapter"]["stacked_xf"]["attn"]
    trainer.train_epoch()  # TP program still compiles and runs unfolded


def test_fold_is_idempotent_on_already_folded_tree():
    """Double-folding (trainer + sweep paths composing) must be a no-op."""
    cfg = TimesFMConfig.tiny()
    stacked = L.init_stacked_layers(
        jax.random.key(1), cfg.num_layers, cfg.model_dims, cfg.num_heads, cfg.head_dim, cfg.ffn_dims
    )
    folded = L.fold_seq1_attention(stacked)
    refolded = L.fold_seq1_attention(folded)
    assert refolded is folded
    x = jax.random.normal(jax.random.key(2), (4, 1, cfg.model_dims), jnp.float32)
    pad = jnp.zeros((4, 1), bool)
    ref = L.stacked_transformer(folded, x, pad, cfg.num_heads, cfg.head_dim)
    got = L.stacked_transformer(refolded, x, pad, cfg.num_heads, cfg.head_dim)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
