"""Frozen sentence encoders behind the reference's TextEncoder interface.

Parity surface: reference ``TextEncoderBase`` / ``EnglishTextEncoder`` /
``JapaneseTextEncoder`` (``/root/reference/src/tsfmx/text_encoder/base.py:12``,
``english.py:10``, ``japanese.py:10``) — same declared dims (384 / 768), the
same dim validation, and the same call contract (texts -> embeddings).

Weights: pass ``model_dir`` pointing at a locally downloaded HF snapshot
(``model.safetensors``/``pytorch_model.bin`` + ``vocab.txt``); see
``text/convert.py``. Without one, the encoder runs with deterministic random
weights and a hashing tokenizer — the full pipeline works end-to-end but
embeddings are not parity with the pretrained models (flagged via
``is_pretrained``).

Note on the Japanese encoder: the reference wraps ``cl-nagoya/ruri-v3-310m``
(ModernBERT architecture). This class currently serves 768-d embeddings from
the same BERT stack; ModernBERT blocks (RoPE + local/global attention) are a
planned follow-up for weight-level parity.
"""

from __future__ import annotations

from abc import ABC
from pathlib import Path

import jax
import numpy as np

from multimodal_timesfm_tpu.text.bert import BertConfig, bert_encode_jit, init_bert
from multimodal_timesfm_tpu.text.tokenizer import HashTokenizer, WordPieceTokenizer
from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()


class TextEncoderBase(ABC):
    """Frozen sentence encoder: callable ``list[str] -> (N, dim) float32``."""

    def __init__(
        self,
        embedding_dim: int,
        config: BertConfig,
        model_dir: Path | str | None = None,
        max_length: int = 256,
        batch_size: int = 32,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.config = config
        self.max_length = max_length
        self.batch_size = batch_size
        self.is_pretrained = False

        if model_dir is not None:
            from multimodal_timesfm_tpu.text.convert import load_hf_bert

            self.params, self.tokenizer = load_hf_bert(Path(model_dir), config)
            self.is_pretrained = True
        else:
            _logger.warning(
                "No model_dir for %s: using random weights + hash tokenizer "
                "(pipeline-functional, NOT embedding-parity)",
                type(self).__name__,
            )
            self.params = init_bert(jax.random.key(0), config)
            self.tokenizer = HashTokenizer(config.vocab_size)

        self._validate()

    def _validate(self) -> None:
        actual = self.config.hidden_size
        if actual != self.embedding_dim:
            raise ValueError(
                f"Embedding dimension mismatch: expected {self.embedding_dim}, got {actual}."
            )

    def __call__(self, texts: str | list[str]) -> np.ndarray:
        """Encode texts -> (N, dim) float32 (or (dim,) for a single string)."""
        single = isinstance(texts, str)
        batch = [texts] if single else list(texts)
        out = np.empty((len(batch), self.embedding_dim), np.float32)
        for i in range(0, len(batch), self.batch_size):
            chunk = batch[i : i + self.batch_size]
            ids, mask = self.tokenizer.encode_batch(chunk, self.max_length)
            emb = bert_encode_jit(self.params, self.config, ids, mask)
            out[i : i + len(chunk)] = np.asarray(emb, np.float32)
        return out[0] if single else out


class EnglishTextEncoder(TextEncoderBase):
    """English encoder: all-MiniLM-L6-v2 geometry, 384-d (reference ``english.py:10-33``)."""

    def __init__(self, model_dir: Path | str | None = None, embedding_dim: int = 384) -> None:
        super().__init__(embedding_dim, BertConfig.minilm_l6(), model_dir)


class JapaneseTextEncoder(TextEncoderBase):
    """Japanese encoder: 768-d (reference ``japanese.py:10-36``; see module note)."""

    def __init__(self, model_dir: Path | str | None = None, embedding_dim: int = 768) -> None:
        config = BertConfig(
            vocab_size=102400, hidden_size=768, num_layers=12, num_heads=12,
            intermediate_size=3072,
        )
        super().__init__(embedding_dim, config, model_dir)


def build_text_encoder(text_encoder_type: str, model_dir: Path | str | None = None) -> TextEncoderBase:
    """Factory keyed like the reference scripts (``cache_time_mmd_datasets.py:63-88``)."""
    if text_encoder_type == "english":
        return EnglishTextEncoder(model_dir)
    if text_encoder_type == "japanese":
        return JapaneseTextEncoder(model_dir)
    raise ValueError(f"Unknown text encoder type: {text_encoder_type!r}")
