"""English text-encoder parity against the REAL sentence-transformers library.

The reference encodes with ``SentenceTransformer.encode`` over
all-MiniLM-L6-v2 (``/root/reference/src/tsfmx/text_encoder/english.py:24-44``:
Transformer -> mean pooling -> L2 normalize). sentence-transformers is
installed in this image (5.6.x vs the reference's pinned 5.3.0 — same encode
semantics), so the whole offline pipeline — WordPiece tokenization, BERT
forward, pooling, normalization — can be checked against the actual library
on a shared synthetic snapshot (tiny BERT geometry, real weights on disk).
"""

import json

import numpy as np
import pytest

st = pytest.importorskip("sentence_transformers")

import jax  # noqa: E402

from multimodal_timesfm_tpu.text.bert import BertConfig, init_bert  # noqa: E402
from multimodal_timesfm_tpu.text.encoders import EnglishTextEncoder  # noqa: E402


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    """Write a tiny-but-real BERT snapshot (config + weights + vocab) to disk."""
    from safetensors.numpy import save_file

    tmp_path = tmp_path_factory.mktemp("st_oracle")
    cfg = BertConfig(vocab_size=60, hidden_size=32, num_layers=2, num_heads=2, intermediate_size=64)
    params = jax.device_get(init_bert(jax.random.key(0), cfg))

    sd = {
        "embeddings.word_embeddings.weight": np.asarray(params["embeddings"]["word"]),
        "embeddings.position_embeddings.weight": np.asarray(params["embeddings"]["position"]),
        "embeddings.token_type_embeddings.weight": np.asarray(params["embeddings"]["token_type"]),
        "embeddings.LayerNorm.weight": np.asarray(params["embeddings"]["ln"]["scale"]),
        "embeddings.LayerNorm.bias": np.asarray(params["embeddings"]["ln"]["bias"]),
    }
    hf_names = {
        "q": "attention.self.query",
        "k": "attention.self.key",
        "v": "attention.self.value",
        "attn_out": "attention.output.dense",
        "ffn_up": "intermediate.dense",
        "ffn_down": "output.dense",
    }
    for i, layer in enumerate(params["layers"]):
        for ours, theirs in hf_names.items():
            sd[f"encoder.layer.{i}.{theirs}.weight"] = np.ascontiguousarray(
                np.asarray(layer[ours]["kernel"]).T
            )
            sd[f"encoder.layer.{i}.{theirs}.bias"] = np.asarray(layer[ours]["bias"])
        sd[f"encoder.layer.{i}.attention.output.LayerNorm.weight"] = np.asarray(layer["attn_ln"]["scale"])
        sd[f"encoder.layer.{i}.attention.output.LayerNorm.bias"] = np.asarray(layer["attn_ln"]["bias"])
        sd[f"encoder.layer.{i}.output.LayerNorm.weight"] = np.asarray(layer["ffn_ln"]["scale"])
        sd[f"encoder.layer.{i}.output.LayerNorm.bias"] = np.asarray(layer["ffn_ln"]["bias"])

    snap = tmp_path / "snap"
    snap.mkdir()
    save_file(sd, str(snap / "model.safetensors"))
    (snap / "config.json").write_text(
        json.dumps(
            {
                "model_type": "bert",
                "architectures": ["BertModel"],
                "hidden_size": cfg.hidden_size,
                "num_hidden_layers": cfg.num_layers,
                "num_attention_heads": cfg.num_heads,
                "intermediate_size": cfg.intermediate_size,
                "vocab_size": cfg.vocab_size,
                "max_position_embeddings": cfg.max_position_embeddings,
                "type_vocab_size": cfg.type_vocab_size,
                "layer_norm_eps": cfg.layer_norm_eps,
            }
        )
    )
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "the", "weather", "report",
             "says", "rain", "sun", "##ny", "storm", "##s", "a", "is", "heavy", "!", ",", "."]
    vocab += [f"tok{i}" for i in range(60 - len(vocab))]
    (snap / "vocab.txt").write_text("\n".join(vocab))
    return snap, cfg


SENTENCES = [
    "the weather report says rain",
    "sunny storms",
    "a heavy storm is , !",
    "",
    "the the the",
]


def test_english_encoder_matches_sentence_transformers(snapshot):
    snap, cfg = snapshot
    from sentence_transformers import SentenceTransformer, models

    word = models.Transformer(str(snap))
    get_dim = getattr(word, "get_embedding_dimension", word.get_word_embedding_dimension)
    pool = models.Pooling(get_dim(), pooling_mode="mean")
    norm = models.Normalize()
    oracle = SentenceTransformer(modules=[word, pool, norm])
    expected = oracle.encode(SENTENCES, convert_to_numpy=True, normalize_embeddings=False)

    ours = EnglishTextEncoder(snap, embedding_dim=cfg.hidden_size)(SENTENCES)
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=2e-5)
