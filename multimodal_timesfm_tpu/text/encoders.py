"""Frozen sentence encoders behind the reference's TextEncoder interface.

Parity surface: reference ``TextEncoderBase`` / ``EnglishTextEncoder`` /
``JapaneseTextEncoder`` (``/root/reference/src/tsfmx/text_encoder/base.py:12``,
``english.py:10``, ``japanese.py:10``) — same declared dims (384 / 768), the
same dim validation, and the same call contract (texts -> embeddings).

  * English: from-scratch JAX BERT at the exact ``all-MiniLM-L6-v2`` geometry
    with a WordPiece tokenizer (native C++ fast path).
  * Japanese: from-scratch JAX ModernBERT at the ``ruri-v3-310m`` geometry
    (RoPE, local/global attention, GeGLU).

Weights: pass ``model_dir`` pointing at a locally downloaded HF snapshot;
without one the encoder runs with deterministic random weights and a hashing
tokenizer — the full pipeline works end-to-end but embeddings are not parity
with the pretrained models (flagged via ``is_pretrained``).
"""

from __future__ import annotations

from typing import Any

from abc import ABC, abstractmethod
from pathlib import Path

import jax
import numpy as np

from multimodal_timesfm_tpu.text.bert import BertConfig, bert_encode_jit, init_bert
from multimodal_timesfm_tpu.text.modernbert import (
    ModernBertConfig,
    convert_hf_modernbert_state,
    init_modernbert,
    modernbert_encode_jit,
)
from multimodal_timesfm_tpu.text.tokenizer import HashTokenizer
from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()


class TextEncoderBase(ABC):
    """Frozen sentence encoder: callable ``list[str] -> (N, dim) float32``."""

    def __init__(
        self,
        embedding_dim: int,
        model_dir: Path | str | None = None,
        max_length: int = 256,
        batch_size: int = 32,
    ) -> None:
        self.embedding_dim = embedding_dim
        self.max_length = max_length
        self.batch_size = batch_size
        self.is_pretrained = False

        if model_dir is not None:
            self.params, self.tokenizer = self._load_pretrained(Path(model_dir))
            self.is_pretrained = True
        else:
            _logger.warning(
                "No model_dir for %s: using random weights + hash tokenizer "
                "(pipeline-functional, NOT embedding-parity)",
                type(self).__name__,
            )
            self.params = self._init_params(jax.random.key(0))
            self.tokenizer = HashTokenizer(self._vocab_size())

        self._validate()

    # -- model-specific hooks --

    @abstractmethod
    def _init_params(self, rng: jax.Array) -> Any: ...

    @abstractmethod
    def _load_pretrained(self, model_dir: Path) -> Any: ...

    @abstractmethod
    def _encode_arrays(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array: ...

    @abstractmethod
    def _vocab_size(self) -> int: ...

    @abstractmethod
    def _hidden_size(self) -> int: ...

    # -- shared interface --

    def _validate(self) -> None:
        actual = self._hidden_size()
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
            emb = self._encode_arrays(ids, mask)
            out[i : i + len(chunk)] = np.asarray(emb, np.float32)
        return out[0] if single else out


class EnglishTextEncoder(TextEncoderBase):
    """English encoder: all-MiniLM-L6-v2 geometry, 384-d (reference ``english.py:10-33``)."""

    def __init__(self, model_dir: Path | str | None = None, embedding_dim: int = 384) -> None:
        self.config = BertConfig.minilm_l6()
        super().__init__(embedding_dim, model_dir)

    def _init_params(self, rng: jax.Array) -> Any:
        return init_bert(rng, self.config)

    def _load_pretrained(self, model_dir: Path) -> Any:
        from multimodal_timesfm_tpu.models.snapshot import bert_config_from_hf, read_hf_config
        from multimodal_timesfm_tpu.text.convert import load_hf_bert

        hf = read_hf_config(model_dir)
        if hf is not None:
            self.config = bert_config_from_hf(hf, defaults=self.config)
        return load_hf_bert(model_dir, self.config)

    def _encode_arrays(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array:
        return bert_encode_jit(self.params, self.config, ids, mask)

    def _vocab_size(self) -> int:
        return self.config.vocab_size

    def _hidden_size(self) -> int:
        return self.config.hidden_size


class JapaneseTextEncoder(TextEncoderBase):
    """Japanese encoder: ruri-v3-310m ModernBERT geometry, 768-d (reference ``japanese.py:10-36``).

    Note: pretrained loading converts ModernBERT weights
    (``text/modernbert.py``); the ruri tokenizer is a unigram/BPE model —
    until a local snapshot provides it, batch encoding uses the hash
    fallback tokenizer.
    """

    def __init__(self, model_dir: Path | str | None = None, embedding_dim: int = 768) -> None:
        self.config = ModernBertConfig.ruri_v3_310m()
        super().__init__(embedding_dim, model_dir)

    def _init_params(self, rng: jax.Array) -> Any:
        return init_modernbert(rng, self.config)

    def _load_pretrained(self, model_dir: Path) -> Any:
        from multimodal_timesfm_tpu.models.snapshot import (
            modernbert_config_from_hf,
            read_hf_config,
        )
        from multimodal_timesfm_tpu.text.convert import _load_state_dict
        from multimodal_timesfm_tpu.text.tokenizer import HFTokenizerWrapper

        hf = read_hf_config(model_dir)
        if hf is not None:
            self.config = modernbert_config_from_hf(hf, defaults=self.config)
        params = convert_hf_modernbert_state(_load_state_dict(model_dir), self.config)
        # ruri's tokenizer is a unigram model; load it from the snapshot via
        # transformers (offline).
        return params, HFTokenizerWrapper(model_dir)

    def _encode_arrays(self, ids: np.ndarray, mask: np.ndarray) -> jax.Array:
        import jax.numpy as jnp

        # Jitted like the English path (bert_encode_jit) — eager dispatch of
        # a 25-layer model per chunk made Japanese cache builds pathologically
        # slow (review finding).
        return modernbert_encode_jit(
            self.params, self.config, jnp.asarray(ids), jnp.asarray(mask)
        )

    def _vocab_size(self) -> int:
        return self.config.vocab_size

    def _hidden_size(self) -> int:
        return self.config.hidden_size


def build_text_encoder(
    text_encoder_type: str,
    model_dir: Path | str | None = None,
    embedding_dim: int | None = None,
) -> TextEncoderBase:
    """Factory keyed like the reference scripts (``cache_time_mmd_datasets.py:63-88``).

    ``model_dir`` may also be an HF repo id (e.g.
    ``sentence-transformers/all-MiniLM-L6-v2``), resolved against local
    snapshot caches — see ``models/snapshot.py``.

    ``embedding_dim`` is the DECLARED dimension validated against the loaded
    model (reference ``text_encoder/english.py:28-33``); callers with a
    fusion config should pass its ``text_embedding_dims`` so non-default
    snapshot geometries validate against the dimension the fusion MLP will
    actually consume. ``None`` keeps the per-type defaults (384/768).
    """
    if model_dir is not None:
        from multimodal_timesfm_tpu.models.snapshot import resolve_snapshot_dir

        model_dir = resolve_snapshot_dir(model_dir)
    if text_encoder_type == "english":
        return EnglishTextEncoder(
            model_dir, **({} if embedding_dim is None else {"embedding_dim": embedding_dim})
        )
    if text_encoder_type == "japanese":
        return JapaneseTextEncoder(
            model_dir, **({} if embedding_dim is None else {"embedding_dim": embedding_dim})
        )
    raise ValueError(f"Unknown text encoder type: {text_encoder_type!r}")
