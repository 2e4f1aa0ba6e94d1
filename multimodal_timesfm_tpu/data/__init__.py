"""Data layer (L3): datasets, batch staging, preprocessing cache."""

from multimodal_timesfm_tpu.data.dataset import (  # noqa: F401
    ConcatDataset,
    MultimodalDatasetBase,
    PreprocessedDataset,
)
from multimodal_timesfm_tpu.data.collate import stack_samples  # noqa: F401
from multimodal_timesfm_tpu.data.preprocess import PreprocessPipeline  # noqa: F401
