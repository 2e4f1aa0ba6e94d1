"""Japanese (ModernBERT) encode-pipeline parity against sentence-transformers.

Counterpart of ``test_sentence_transformers_oracle.py`` for the ruri-v3
architecture: a tiny ModernBERT snapshot is written to disk and encoded both
by our ``JapaneseTextEncoder`` (snapshot config.json geometry, HF tokenizer,
JAX forward, mean pool, L2 norm) and by the real ``SentenceTransformer``
(Transformer -> Pooling(mean) -> Normalize) — the ``.encode()`` contract the
reference wraps (``/root/reference/src/tsfmx/text_encoder/japanese.py``).
"""

import json

import numpy as np
import pytest

st = pytest.importorskip("sentence_transformers")
torch = pytest.importorskip("torch")

pytest.importorskip("transformers")


@pytest.fixture(scope="module")
def snapshot(tmp_path_factory):
    from safetensors.torch import save_file
    from transformers import ModernBertConfig as HFConfig, ModernBertModel

    tmp_path = tmp_path_factory.mktemp("st_oracle_ja")
    hf_cfg = HFConfig(
        vocab_size=64,
        hidden_size=32,
        num_hidden_layers=4,
        num_attention_heads=2,
        intermediate_size=48,
        global_attn_every_n_layers=3,
        local_attention=4,
        attention_dropout=0.0,
        mlp_dropout=0.0,
        embedding_dropout=0.0,
        reference_compile=False,
        pad_token_id=0,
        bos_token_id=2,
        eos_token_id=3,
        cls_token_id=2,
        sep_token_id=3,
        architectures=["ModernBertModel"],
    )
    torch.manual_seed(1)
    model = ModernBertModel(hf_cfg).eval()

    snap = tmp_path / "snap"
    snap.mkdir()
    save_file(
        {k: v.contiguous() for k, v in model.state_dict().items()},
        str(snap / "model.safetensors"),
    )
    (snap / "config.json").write_text(model.config.to_json_string())
    vocab = ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]", "天気", "予報", "雨", "晴れ",
             "嵐", "です", "、", "。", "!", "the", "rain"]
    vocab += [f"tok{i}" for i in range(64 - len(vocab))]
    (snap / "vocab.txt").write_text("\n".join(vocab))
    (snap / "tokenizer_config.json").write_text(
        json.dumps(
            {
                "tokenizer_class": "BertTokenizer",
                "do_lower_case": True,
                # ModernBERT takes no token_type_ids; keep the tokenizer's
                # feature set to what the model accepts.
                "model_input_names": ["input_ids", "attention_mask"],
            }
        )
    )
    return snap


SENTENCES = ["天気 予報 雨", "晴れ です 。", "嵐 、 rain !", ""]


def test_japanese_encoder_matches_sentence_transformers(snapshot):
    from sentence_transformers import SentenceTransformer, models

    from multimodal_timesfm_tpu.text.encoders import JapaneseTextEncoder

    word = models.Transformer(str(snapshot))
    get_dim = getattr(word, "get_embedding_dimension", word.get_word_embedding_dimension)
    oracle = SentenceTransformer(
        modules=[word, models.Pooling(get_dim(), pooling_mode="mean"), models.Normalize()]
    )
    expected = oracle.encode(SENTENCES, convert_to_numpy=True)

    ours = JapaneseTextEncoder(snapshot, embedding_dim=32)(SENTENCES)
    assert ours.shape == expected.shape
    np.testing.assert_allclose(ours, expected, atol=5e-5)
