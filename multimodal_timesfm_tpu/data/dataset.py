"""Dataset containers (torch-free).

Parity: reference ``MultimodalDatasetBase`` / ``PreprocessedDataset``
(``/root/reference/src/tsfmx/data/dataset.py:10-43``) and torch
``ConcatDataset`` (used at ``examples/time_mmd/cross_validation.py:73-78``),
re-expressed as plain python sequence types — there is no DataLoader here;
the trainer stages whole datasets into dense device arrays instead.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from typing import Generic, Iterator, Sequence, TypeVar

from multimodal_timesfm_tpu.types import PreprocessedSample, RawSample, TrainingMode

T = TypeVar("T")


class SizedDataset(Generic[T], ABC):
    """Minimal dataset protocol: __len__ + __getitem__."""

    @abstractmethod
    def __getitem__(self, index: int) -> T: ...

    @abstractmethod
    def __len__(self) -> int: ...

    def __iter__(self) -> Iterator[T]:
        for i in range(len(self)):
            yield self[i]


class MultimodalDatasetBase(SizedDataset[RawSample], ABC):
    """Abstract base class for raw multimodal time-series datasets."""


class PreprocessedDataset(SizedDataset[PreprocessedSample]):
    """Wraps cached preprocessed samples; validates text embeddings in multimodal mode.

    Parity: reference ``data/dataset.py:20-43``.
    """

    def __init__(self, data: list[PreprocessedSample], mode: TrainingMode) -> None:
        self.data = data
        self.mode = mode
        self._validate()

    def _validate(self) -> None:
        if self.mode == "multimodal" and not all("text_embeddings" in s for s in self.data):
            raise ValueError("All samples must contain 'text_embeddings' for multimodal mode")

    def __getitem__(self, index: int) -> PreprocessedSample:
        return self.data[index]

    def __len__(self) -> int:
        return len(self.data)


class ConcatDataset(SizedDataset[T]):
    """Concatenation of datasets (drop-in for the torch ConcatDataset usage)."""

    def __init__(self, datasets: Sequence[SizedDataset[T] | Sequence[T]]) -> None:
        self.datasets = list(datasets)
        self._lengths = [len(d) for d in self.datasets]

    def __getitem__(self, index: int) -> T:
        if index < 0:
            index += len(self)
            # Still-negative after wrapping = out of range. Without this
            # check the loop's `index < n` test passes and the FIRST
            # dataset's list silently serves a Python-negative index —
            # wrong sample instead of an error (torch raises here too).
            if index < 0:
                raise IndexError("index out of range")
        for d, n in zip(self.datasets, self._lengths):
            if index < n:
                return d[index]
            index -= n
        raise IndexError("index out of range")

    def __len__(self) -> int:
        return sum(self._lengths)
