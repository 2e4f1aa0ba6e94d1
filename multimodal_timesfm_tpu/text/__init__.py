"""Text encoder subsystem: frozen sentence encoders for the offline embedding cache.

Parity surface: the reference uses SentenceTransformer models offline only
(``/root/reference/src/tsfmx/text_encoder/*.py``): English
``all-MiniLM-L6-v2`` (384-d) and Japanese ``cl-nagoya/ruri-v3-310m`` (768-d),
encoding each patch's joined text into one embedding. Here the encoder is a
from-scratch JAX BERT with mean pooling + L2 normalization, plus a WordPiece
tokenizer; HF weights load from a local directory via ``convert``.
"""

from multimodal_timesfm_tpu.text.encoders import (  # noqa: F401
    EnglishTextEncoder,
    JapaneseTextEncoder,
    TextEncoderBase,
    build_text_encoder,
)
