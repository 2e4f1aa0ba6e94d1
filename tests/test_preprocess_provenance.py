"""Text-encoder provenance in embedding caches (VERDICT round 1, weak #6).

Caches record whether their embeddings came from pretrained weights; loading
a hash-fallback cache warns loudly, and ``require_pretrained_embeddings=True``
refuses it so parity evals cannot silently run on degraded embeddings.
"""

import numpy as np
import pytest

from multimodal_timesfm_tpu.data.dataset import MultimodalDatasetBase
from multimodal_timesfm_tpu.data.preprocess import PreprocessPipeline


class _ToyDataset(MultimodalDatasetBase):
    def __init__(self, n=3):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i):
        return {
            "context": np.full(8, float(i), np.float32),
            "horizon": np.zeros(4, np.float32),
            "patched_texts": [["report a"], []],
            "metadata": {"domain": "toy", "index": i},
        }


class _FakeEncoder:
    """Mimics TextEncoderBase: callable with an ``is_pretrained`` attribute."""

    def __init__(self, is_pretrained):
        self.is_pretrained = is_pretrained

    def __call__(self, texts):
        return np.ones((len(texts), 6), np.float32)


def _build(tmp_path, pretrained: bool):
    pipeline = PreprocessPipeline(tmp_path)
    path = pipeline.get_path("toy", "d", "english", 4, 8, 4)
    pipeline.prepare(path, _ToyDataset, _FakeEncoder(pretrained), force_rebuild=True)
    return pipeline, path


def test_cache_records_encoder_provenance(tmp_path):
    pipeline, path = _build(tmp_path, pretrained=False)
    samples = pipeline.load(path)
    for s in samples:
        assert s["metadata"]["text_encoder"] == {
            "encoder": "_FakeEncoder",
            "is_pretrained": False,
        }
        # original metadata preserved alongside the stamp
        assert s["metadata"]["domain"] == "toy"


def test_load_warns_on_fallback_embeddings(tmp_path, caplog):
    pipeline, path = _build(tmp_path, pretrained=False)
    with caplog.at_level("WARNING", logger="multimodal_timesfm_tpu"):
        pipeline.load(path)
    assert any("WITHOUT pretrained" in r.message for r in caplog.records)


def test_load_refuses_fallback_when_required(tmp_path):
    pipeline, path = _build(tmp_path, pretrained=False)
    with pytest.raises(ValueError, match="WITHOUT pretrained"):
        pipeline.load(path, require_pretrained_embeddings=True)


def test_pretrained_cache_loads_clean(tmp_path, caplog):
    pipeline, path = _build(tmp_path, pretrained=True)
    with caplog.at_level("WARNING", logger="multimodal_timesfm_tpu"):
        samples = pipeline.load(path, require_pretrained_embeddings=True)
    assert len(samples) == 3
    assert not any("WITHOUT pretrained" in r.message for r in caplog.records)


def test_legacy_cache_without_stamp_loads(tmp_path):
    """Caches built by the reference (no provenance key) load without fuss."""
    import pickle

    path = tmp_path / "legacy.pkl"
    with open(path, "wb") as f:
        pickle.dump(
            [
                {
                    "context": np.zeros(8, np.float32),
                    "horizon": np.zeros(4, np.float32),
                    "text_embeddings": np.zeros((2, 6), np.float32),
                    "metadata": {},
                }
            ],
            f,
        )
    pipeline = PreprocessPipeline(tmp_path)
    assert len(pipeline.load(path, require_pretrained_embeddings=True)) == 1
