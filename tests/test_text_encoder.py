"""Text encoder tests: BERT forward parity vs HF torch, tokenizer parity, interface."""

import numpy as np
import pytest

from multimodal_timesfm_tpu.text.bert import BertConfig, bert_encode, init_bert
from multimodal_timesfm_tpu.text.encoders import EnglishTextEncoder, build_text_encoder
from multimodal_timesfm_tpu.text.tokenizer import HashTokenizer, WordPieceTokenizer

VOCAB = (
    "[PAD] [UNK] [CLS] [SEP] [MASK] the quick brown fox jump ##s over lazy dog "
    "report prediction search energy price ##d , . ! un ##known".split()
)


@pytest.fixture()
def vocab_file(tmp_path):
    p = tmp_path / "vocab.txt"
    p.write_text("\n".join(VOCAB) + "\n")
    return p


def test_wordpiece_matches_transformers(vocab_file):
    from transformers import BertTokenizer

    ours = WordPieceTokenizer(vocab_file)
    theirs = BertTokenizer(str(vocab_file), do_lower_case=True)
    for text in [
        "The quick brown fox jumps over the lazy dog",
        "Report: energy priced, searched!",
        "unknown unknowable",
        "",
        "  spaces   and, punctuation! ",
    ]:
        ref = theirs.encode(text, add_special_tokens=True)
        got = ours.encode(text)
        assert got == ref, f"{text!r}: {got} != {ref}"


def test_encode_batch_padding(vocab_file):
    tok = WordPieceTokenizer(vocab_file)
    ids, mask = tok.encode_batch(["the quick fox", "the"])
    assert ids.shape == mask.shape
    assert ids.shape[1] == 16  # smallest bucket
    assert mask[0].sum() > mask[1].sum()
    assert (ids[mask == 0] == tok.pad_id).all()


def test_hash_tokenizer_deterministic():
    tok = HashTokenizer(1000)
    a = tok.encode("energy prices rose")
    b = tok.encode("energy prices rose")
    assert a == b
    assert a[0] == tok.cls_id and a[-1] == tok.sep_id


def test_bert_forward_parity_with_hf_torch():
    """Random-weight HF BertModel vs our JAX stack (same weights, mean pool + L2)."""
    import torch
    from transformers import BertConfig as HFConfig, BertModel

    cfg = BertConfig.tiny()
    hf_cfg = HFConfig(
        vocab_size=cfg.vocab_size,
        hidden_size=cfg.hidden_size,
        num_hidden_layers=cfg.num_layers,
        num_attention_heads=cfg.num_heads,
        intermediate_size=cfg.intermediate_size,
        max_position_embeddings=cfg.max_position_embeddings,
        hidden_act="gelu",
    )
    torch.manual_seed(0)
    hf = BertModel(hf_cfg).eval()

    from multimodal_timesfm_tpu.text.convert import convert_hf_bert_state

    sd = {k: v.numpy() for k, v in hf.state_dict().items()}
    params = convert_hf_bert_state(sd, cfg)

    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(2, 10)).astype(np.int32)
    mask = np.ones((2, 10), np.int32)
    mask[1, 6:] = 0

    ours = np.asarray(bert_encode(params, cfg, ids, mask))

    with torch.no_grad():
        out = hf(
            input_ids=torch.from_numpy(ids).long(),
            attention_mask=torch.from_numpy(mask).long(),
        ).last_hidden_state
        m = torch.from_numpy(mask).float()[..., None]
        pooled = (out * m).sum(1) / m.sum(1).clamp(min=1e-9)
        ref = torch.nn.functional.normalize(pooled, dim=-1).numpy()

    np.testing.assert_allclose(ours, ref, atol=3e-5)


def test_english_encoder_interface():
    enc = EnglishTextEncoder()  # random weights + hash tokenizer (offline)
    out = enc(["energy prices rose", "", "reports were positive"])
    assert out.shape == (3, 384)
    norms = np.linalg.norm(out, axis=-1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
    single = enc("energy prices rose")
    assert single.shape == (384,)
    np.testing.assert_allclose(single, out[0], atol=1e-5)
    assert not enc.is_pretrained


def test_dim_validation():
    with pytest.raises(ValueError, match="dimension mismatch"):
        EnglishTextEncoder(embedding_dim=512)


def test_factory():
    assert build_text_encoder("english").embedding_dim == 384
    with pytest.raises(ValueError, match="Unknown"):
        build_text_encoder("german")


def test_hf_tokenizer_wrapper_local_snapshot(tmp_path, vocab_file):
    """HFTokenizerWrapper loads a local snapshot (no network) and matches ids."""
    import shutil
    from transformers import BertTokenizer

    from multimodal_timesfm_tpu.text.tokenizer import HFTokenizerWrapper

    snap = tmp_path / "snap"
    snap.mkdir()
    shutil.copy(vocab_file, snap / "vocab.txt")
    (snap / "tokenizer_config.json").write_text('{"tokenizer_class": "BertTokenizer"}')

    wrapper = HFTokenizerWrapper(snap)
    hf = BertTokenizer(str(vocab_file), do_lower_case=True)
    text = "the quick brown fox"
    assert wrapper.encode(text) == hf.encode(text, add_special_tokens=True)
    ids, mask = wrapper.encode_batch([text, "the"])
    assert ids.shape == mask.shape and ids.shape[1] == 16


def test_tokenizer_fuzz_vs_hf(vocab_file):
    """Randomized text: python WordPiece ids must always equal HF BertTokenizer."""
    import random

    from transformers import BertTokenizer

    hf = BertTokenizer(str(vocab_file), do_lower_case=True)
    py = WordPieceTokenizer(vocab_file, use_native=False)
    rng = random.Random(0)
    alphabet = (
        "abcdefgh THE QUICK brown fox ,.!«»¿·​­‎﻿"
        "éàüñÅŁðßœ漢字カナ 0123  \t\n"
    )
    for _ in range(200):
        text = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 40)))
        assert py.encode(text) == hf.encode(text, add_special_tokens=True), repr(text)


def test_encode_refuses_bool_mask():
    """The text encoders use HF mask polarity (int, 1=valid) — the inverse of
    the repo-wide bool True=padded convention. A bool mask is refused so a
    convention mix-up can't silently invert attention (review finding)."""
    import jax
    import jax.numpy as jnp

    cfg = BertConfig(vocab_size=32, hidden_size=8, num_layers=1, num_heads=2,
                     intermediate_size=16, max_position_embeddings=16)
    params = init_bert(jax.random.key(0), cfg)
    ids = jnp.zeros((1, 4), jnp.int32)
    with pytest.raises(TypeError, match="bool mask"):
        bert_encode(params, cfg, ids, jnp.zeros((1, 4), bool))

    from multimodal_timesfm_tpu.text.modernbert import (
        ModernBertConfig,
        init_modernbert,
        modernbert_encode,
    )

    mcfg = ModernBertConfig(vocab_size=32, hidden_size=8, num_layers=1, num_heads=2,
                            intermediate_size=16)
    mparams = init_modernbert(jax.random.key(0), mcfg)
    with pytest.raises(TypeError, match="bool mask"):
        modernbert_encode(mparams, mcfg, ids, jnp.zeros((1, 4), bool))


def test_modernbert_jit_matches_eager():
    """modernbert_encode_jit == eager encode (the Japanese cache path now
    dispatches one compiled program per chunk instead of hundreds of eager
    ops — review finding)."""
    import jax
    import jax.numpy as jnp

    from multimodal_timesfm_tpu.text.modernbert import (
        ModernBertConfig,
        init_modernbert,
        modernbert_encode,
        modernbert_encode_jit,
    )

    cfg = ModernBertConfig(vocab_size=64, hidden_size=16, num_layers=2, num_heads=2,
                           intermediate_size=32)
    params = init_modernbert(jax.random.key(1), cfg)
    rng = np.random.default_rng(0)
    ids = jnp.asarray(rng.integers(0, 64, size=(3, 10)), jnp.int32)
    mask = jnp.asarray((rng.random((3, 10)) > 0.2).astype(np.int32))
    np.testing.assert_allclose(
        np.asarray(modernbert_encode_jit(params, cfg, ids, mask)),
        np.asarray(modernbert_encode(params, cfg, ids, mask)),
        atol=1e-6,
    )


def test_custom_max_chars_routes_to_python(vocab_file):
    """A non-default max_input_chars_per_word bypasses the native path (the
    C++ vocab hardcodes 100) so both configurations tokenize identically
    (review finding)."""
    tok = WordPieceTokenizer(vocab_file, max_input_chars_per_word=5)
    assert tok._native is None
    # "report" (6 chars) exceeds the budget -> [UNK]; "fox" stays a token
    ids = tok.encode("report fox")
    unk, fox = tok.vocab["[UNK]"], tok.vocab["fox"]
    assert unk in ids and fox in ids

    default = WordPieceTokenizer(vocab_file)  # native allowed at the default
    ids_d = default.encode("report fox")
    assert tok.vocab["report"] in ids_d
