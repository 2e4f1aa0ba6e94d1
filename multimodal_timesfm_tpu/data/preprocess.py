"""Offline preprocessing pipeline: text-embedding cache with the reference's path scheme.

Parity: reference ``PreprocessPipeline``
(``/root/reference/src/tsfmx/data/preprocess.py:17-134``), including the
cache-key path scheme ``{dataset}_{entity}_{enc}_p{P}_c{C}_h{H}[_aug].pkl``
so caches are interchangeable between implementations at the pickle level.
"""

from __future__ import annotations

import pickle
from pathlib import Path
from typing import Callable

import numpy as np

from multimodal_timesfm_tpu.data.dataset import MultimodalDatasetBase
from multimodal_timesfm_tpu.types import PreprocessedSample
from multimodal_timesfm_tpu.utils.logging import get_logger

_logger = get_logger()


class PreprocessPipeline:
    """End-to-end preprocessing: path generation, persistence, and execution."""

    def __init__(self, cache_dir: Path) -> None:
        self.cache_dir = Path(cache_dir)
        self.cache_dir.mkdir(parents=True, exist_ok=True)

    def get_path(
        self,
        dataset_name: str,
        entity: str,
        text_encoder_type: str,
        patch_len: int,
        context_len: int,
        horizon_len: int,
        augment: bool = False,
    ) -> Path:
        """Cache path for a configuration (reference ``preprocess.py:24-58``)."""
        parts = [
            dataset_name,
            entity,
            text_encoder_type,
            f"p{patch_len}",
            f"c{context_len}",
            f"h{horizon_len}",
        ]
        if augment:
            parts.append("aug")
        return self.cache_dir / ("_".join(parts) + ".pkl")

    def load(
        self, path: Path, require_pretrained_embeddings: bool = False
    ) -> list[PreprocessedSample]:
        """Load a cache file.

        Embedding provenance: caches built from a pretrained sentence-encoder
        snapshot are stamped ``is_pretrained=True`` in each sample's metadata
        (see ``_preprocess``); caches built with the random-weights/hash
        fallback are stamped False and loading them WARNS loudly. Pass
        ``require_pretrained_embeddings=True`` to refuse such caches — any
        eval meant for comparison against the reference should.
        """
        _logger.info("Loading preprocessed data from %s", path)
        if not path.exists():
            raise FileNotFoundError(
                f"Cache file not found: {path}. Build it with "
                "scripts/cache_time_mmd_datasets.py (add --augment for caches "
                "with the '_aug' suffix), or adjust the requested augment flags."
            )
        with open(path, "rb") as f:
            data: list[PreprocessedSample] = pickle.load(f)
        _logger.info("Loaded %s samples", len(data))

        provenance = next(
            (s["metadata"].get("text_encoder") for s in data if "metadata" in s), None
        )
        if provenance is not None and not provenance.get("is_pretrained", True):
            message = (
                f"{path.name} was built WITHOUT pretrained text-encoder weights "
                f"(encoder={provenance.get('encoder')}): embeddings are "
                "pipeline-functional but not parity-grade."
            )
            if require_pretrained_embeddings:
                raise ValueError(
                    message + " Rebuild the cache with --text-model-dir pointing "
                    "at a local snapshot (docs/PRETRAINED.md)."
                )
            _logger.warning(message)
        return data

    def _save(self, path: Path, data: list[PreprocessedSample]) -> None:
        _logger.info("Saving %s samples to %s", len(data), path)
        with open(path, "wb") as f:
            pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
        _logger.info("Saved %.2f MB", path.stat().st_size / (1024 * 1024))

    def _preprocess(
        self,
        dataset: MultimodalDatasetBase,
        text_encoder: Callable[[list[str]], np.ndarray] | None,
    ) -> list[PreprocessedSample]:
        """Embed each sample's per-patch texts (joined with spaces; '' if none).

        Parity: reference ``preprocess.py:74-106``. ``text_encoder`` is any
        callable list[str] -> (N, T) float array (frozen sentence encoder).
        Unlike the reference there is no device argument — the JAX encoder
        manages its own placement.
        """
        _logger.info(
            "Preprocessing %s samples (%s)",
            len(dataset),
            "multimodal" if text_encoder is not None else "baseline",
        )
        result: list[PreprocessedSample] = []
        for i in range(len(dataset)):
            sample = dataset[i]
            entry = PreprocessedSample(
                context=sample["context"],
                horizon=sample["horizon"],
                metadata=sample["metadata"],
            )
            if text_encoder is not None:
                texts = [" ".join(patch) if patch else "" for patch in sample["patched_texts"]]
                entry["text_embeddings"] = np.asarray(text_encoder(texts), np.float32)
                # Stamp embedding provenance so downstream loads can warn on /
                # refuse hash-fallback (non-pretrained) embeddings. Extra
                # metadata keys keep the pickle reference-interchangeable.
                entry["metadata"] = dict(entry["metadata"]) | {
                    "text_encoder": {
                        "encoder": type(text_encoder).__name__,
                        "is_pretrained": bool(getattr(text_encoder, "is_pretrained", True)),
                    }
                }
            result.append(entry)
            if (i + 1) % 100 == 0:
                _logger.info("Preprocessed %s/%s samples", i + 1, len(dataset))
        _logger.info("Preprocessing complete")
        return result

    def prepare(
        self,
        path: Path,
        dataset_factory: Callable[[], MultimodalDatasetBase],
        text_encoder: Callable[[list[str]], np.ndarray] | None = None,
        force_rebuild: bool = False,
    ) -> list[PreprocessedSample]:
        """Load from disk, or build + save if absent (reference ``preprocess.py:108-134``)."""
        if not force_rebuild and path.exists():
            return self.load(path)
        dataset = dataset_factory()
        data = self._preprocess(dataset, text_encoder)
        self._save(path, data)
        return data
