"""HF BERT snapshot -> JAX pytree weight conversion for the sentence encoders.

Loads a locally-downloaded HF model directory (as produced by
``huggingface_hub.snapshot_download`` for e.g.
``sentence-transformers/all-MiniLM-L6-v2``) into the ``text/bert.py`` params
structure, plus its ``vocab.txt`` WordPiece tokenizer. Torch linear weights
are (out, in) and are transposed to (in, out) kernels.
"""

from __future__ import annotations

from pathlib import Path

import jax.numpy as jnp
import numpy as np

from multimodal_timesfm_tpu.text.bert import BertConfig
from multimodal_timesfm_tpu.text.tokenizer import WordPieceTokenizer


def _load_state_dict(model_dir: Path) -> dict[str, np.ndarray]:
    """Read model.safetensors or pytorch_model.bin into numpy arrays."""
    st_path = model_dir / "model.safetensors"
    if st_path.exists():
        from safetensors.numpy import load_file

        return dict(load_file(str(st_path)))
    bin_path = model_dir / "pytorch_model.bin"
    if bin_path.exists():
        import torch

        sd = torch.load(bin_path, map_location="cpu", weights_only=True)
        return {k: v.numpy() for k, v in sd.items()}
    raise FileNotFoundError(f"No model.safetensors or pytorch_model.bin in {model_dir}")


def convert_hf_bert_state(sd: dict[str, np.ndarray], cfg: BertConfig) -> dict:
    """Map HF BERT parameter names to the text/bert.py pytree."""
    # Some snapshots prefix everything with "bert." — strip it.
    if any(k.startswith("bert.") for k in sd):
        sd = {k.removeprefix("bert."): v for k, v in sd.items()}

    def dense(prefix: str) -> dict:
        return {
            "kernel": jnp.asarray(sd[f"{prefix}.weight"]).T,
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    def ln(prefix: str) -> dict:
        return {
            "scale": jnp.asarray(sd[f"{prefix}.weight"]),
            "bias": jnp.asarray(sd[f"{prefix}.bias"]),
        }

    params = {
        "embeddings": {
            "word": jnp.asarray(sd["embeddings.word_embeddings.weight"]),
            "position": jnp.asarray(sd["embeddings.position_embeddings.weight"]),
            "token_type": jnp.asarray(sd["embeddings.token_type_embeddings.weight"]),
            "ln": ln("embeddings.LayerNorm"),
        },
        "layers": [],
    }
    for i in range(cfg.num_layers):
        base = f"encoder.layer.{i}"
        params["layers"].append(
            {
                "q": dense(f"{base}.attention.self.query"),
                "k": dense(f"{base}.attention.self.key"),
                "v": dense(f"{base}.attention.self.value"),
                "attn_out": dense(f"{base}.attention.output.dense"),
                "attn_ln": ln(f"{base}.attention.output.LayerNorm"),
                "ffn_up": dense(f"{base}.intermediate.dense"),
                "ffn_down": dense(f"{base}.output.dense"),
                "ffn_ln": ln(f"{base}.output.LayerNorm"),
            }
        )
    return params


def load_hf_bert(model_dir: Path, cfg: BertConfig) -> tuple[dict, WordPieceTokenizer]:
    """Load (params, tokenizer) from a local HF snapshot directory."""
    params = convert_hf_bert_state(_load_state_dict(model_dir), cfg)
    vocab = model_dir / "vocab.txt"
    if not vocab.exists():
        raise FileNotFoundError(f"vocab.txt not found in {model_dir}")
    return params, WordPieceTokenizer(vocab)
