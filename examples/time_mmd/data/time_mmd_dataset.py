"""Time-MMD dataset loader: numerical series + patch-aligned textual reports.

Behavior parity with the reference loader
(``/root/reference/examples/time_mmd/data/time_mmd_dataset.py:13-405``):

  * loads ``numerical/{D}/{D}.csv`` plus optional
    ``textual/{D}/{D}_report.csv`` / ``{D}_search.csv``, sorted by start date,
  * per configured numeric column: trims leading/trailing NaN/inf, replaces
    interior invalids via linear interpolation + ffill/bfill,
  * slides windows of ``context_len + horizon_len`` with stride
    ``horizon_len``; optional augmentation adds one window set per start
    shift in ``range(patch_len)``,
  * per-sample z-score using **context statistics only**, std clamped to 1.0
    below 1e-6,
  * divides each window's date span evenly into ``context_len // patch_len``
    sub-periods and collects overlapping texts with ``Report: `` /
    ``Report Prediction: `` / ``Search: `` / ``Search prediction: ``
    prefixes from the ``fact``/``preds`` columns; texts that are
    None/NaN/empty or start with ``NA`` are dropped,
  * metadata records domain/column/shift/start_index/mean/std.

Implementation difference (SURVEY.md §3.5 hot loop #4): the reference
re-parses dates and ``iterrows``-scans every text row for every patch of
every window — O(windows x patches x rows) pandas overhead. Here each text
table is cleaned and datetime-parsed ONCE into numpy arrays, and each patch
period is a vectorized interval-overlap mask over those arrays. Output
ordering is identical (row order; fact before preds; reports before search).
"""

from __future__ import annotations

from dataclasses import dataclass
from pathlib import Path

import numpy as np
import pandas as pd

from examples.time_mmd.configs.domain_columns import (
    DEFAULT_TIME_MMD_CONFIGS,
    DomainColumnConfig,
)
from multimodal_timesfm_tpu.data.dataset import MultimodalDatasetBase
from multimodal_timesfm_tpu.types import RawSample

_STD_EPS = 1e-6


def _clean_text(text) -> str | None:
    """None/NaN/empty/'NA'-prefixed -> None, else the stripped string.

    Parity: reference ``_clean_and_validate_text`` (``time_mmd_dataset.py:163-191``).
    """
    if text is None or (isinstance(text, float) and np.isnan(text)):
        return None
    try:
        if pd.isna(text):
            return None
    except (TypeError, ValueError):
        pass
    text_str = str(text).strip()
    if not text_str or text_str.startswith("NA"):
        return None
    return text_str


@dataclass
class _TextTable:
    """One textual CSV, pre-cleaned into parallel numpy arrays for interval joins."""

    starts: np.ndarray  # datetime64[ns]
    ends: np.ndarray  # datetime64[ns]
    texts: list[list[str]]  # per row: prefixed fact/preds strings, in order

    @classmethod
    def build(cls, df: pd.DataFrame, fact_prefix: str, preds_prefix: str) -> "_TextTable | None":
        if "start_date" not in df.columns or "end_date" not in df.columns:
            return None
        starts = pd.to_datetime(df["start_date"]).to_numpy()
        ends = pd.to_datetime(df["end_date"]).to_numpy()
        has_fact = "fact" in df.columns
        has_preds = "preds" in df.columns
        texts: list[list[str]] = []
        for i in range(len(df)):
            row_texts: list[str] = []
            if has_fact:
                cleaned = _clean_text(df["fact"].iloc[i])
                if cleaned is not None:
                    row_texts.append(f"{fact_prefix}{cleaned}")
            if has_preds:
                cleaned = _clean_text(df["preds"].iloc[i])
                if cleaned is not None:
                    row_texts.append(f"{preds_prefix}{cleaned}")
            texts.append(row_texts)
        return cls(starts=starts, ends=ends, texts=texts)

    def overlapping(self, patch_start: np.datetime64, patch_end: np.datetime64) -> list[str]:
        """All texts of rows whose [start, end] overlaps [patch_start, patch_end]."""
        mask = (self.starts <= patch_end) & (self.ends >= patch_start)
        out: list[str] = []
        for idx in np.flatnonzero(mask):
            out.extend(self.texts[idx])
        return out


class TimeMmdDataset(MultimodalDatasetBase):
    """Loader for one Time-MMD domain.

    Expected directory structure (reference ``time_mmd_dataset.py:20-28``)::

        data_dir/
          numerical/(Domain)/(Domain).csv
          textual/(Domain)/(Domain)_report.csv
          textual/(Domain)/(Domain)_search.csv
    """

    def __init__(
        self,
        data_dir: Path,
        domain: str,
        patch_len: int = 32,
        context_len: int = 32,
        horizon_len: int = 32,
        column_config: DomainColumnConfig | None = None,
        augment: bool = False,
    ) -> None:
        self.data_dir = Path(data_dir)
        self.domain = domain
        self.patch_len = patch_len
        self.context_len = context_len
        self.horizon_len = horizon_len
        self.column_config = column_config or DEFAULT_TIME_MMD_CONFIGS.get_config_for_domain(domain)
        self.augment = augment
        self.data: list[RawSample] = []

        self._validate()
        self._load_data()

    def _validate(self) -> None:
        if not self.data_dir.exists():
            raise FileNotFoundError(f"Data directory not found: {self.data_dir}")
        if self.context_len % self.patch_len != 0:
            raise ValueError(
                f"context_len ({self.context_len}) must be an integer multiple of "
                f"patch_len ({self.patch_len})"
            )
        if self.horizon_len % self.patch_len != 0:
            raise ValueError(
                f"horizon_len ({self.horizon_len}) must be an integer multiple of "
                f"patch_len ({self.patch_len})"
            )

    # ------------------------------------------------------------------
    # series sanitation / normalization
    # ------------------------------------------------------------------

    @staticmethod
    def _sanitize_series(
        values: np.ndarray, start_dates: np.ndarray, end_dates: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, np.ndarray] | None:
        """Trim leading/trailing invalids; interpolate interior invalids.

        Parity: reference ``_sanitize_time_series`` (``time_mmd_dataset.py:87-130``).
        Returns None when the column has no valid values at all.
        """
        vals = values.astype(float)
        finite = np.isfinite(vals)  # False for NaN and +/-inf
        valid_idx = np.flatnonzero(finite)
        if valid_idx.size == 0:
            return None
        lo, hi = valid_idx[0], valid_idx[-1] + 1
        vals = vals[lo:hi]
        starts = start_dates[lo:hi]
        ends = end_dates[lo:hi]

        if not np.all(np.isfinite(vals)):
            series = pd.Series(vals).replace([np.inf, -np.inf], np.nan)
            series = series.interpolate(method="linear", limit_direction="both")
            vals = series.ffill().bfill().to_numpy()
        return vals, starts, ends

    @staticmethod
    def _zscore_window(
        context: np.ndarray, horizon: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray, float, float]:
        """Z-score both windows with context-only stats (std<1e-6 -> 1.0).

        Parity: reference ``_normalize_sample`` (``time_mmd_dataset.py:132-161``).
        """
        mean = float(np.mean(context))
        std = float(np.std(context))
        if std < _STD_EPS:
            std = 1.0
        return (context - mean) / std, (horizon - mean) / std, mean, std

    # ------------------------------------------------------------------
    # text windowing (vectorized interval joins)
    # ------------------------------------------------------------------

    def _patched_texts(
        self,
        window_start: np.datetime64,
        window_end: np.datetime64,
        tables: list[_TextTable],
        num_patches: int,
    ) -> list[list[str]]:
        """Split [window_start, window_end] into equal sub-periods; gather overlaps.

        Parity: reference ``_get_patched_texts_for_period``
        (``time_mmd_dataset.py:193-267``), with the per-row scans replaced by
        vectorized masks over the pre-built tables.
        """
        start = pd.Timestamp(window_start)
        duration = (pd.Timestamp(window_end) - start) / num_patches
        patches: list[list[str]] = []
        for i in range(num_patches):
            patch_start = (start + i * duration).to_datetime64()
            patch_end = (start + (i + 1) * duration).to_datetime64()
            collected: list[str] = []
            for table in tables:
                collected.extend(table.overlapping(patch_start, patch_end))
            patches.append(collected)
        return patches

    # ------------------------------------------------------------------
    # main processing
    # ------------------------------------------------------------------

    def _process_data(self, numerical_df: pd.DataFrame, tables: list[_TextTable]) -> None:
        numeric_cols = self.column_config.get_time_series_columns(
            all_columns=numerical_df.columns.tolist()
        )
        if not numeric_cols:
            raise ValueError(
                f"No time series columns found for domain {self.domain!r} with the given configuration"
            )

        for col_name in (self.column_config.start_date_col, self.column_config.end_date_col):
            if col_name not in numerical_df.columns:
                raise ValueError(
                    f"Date column {col_name!r} not found in numerical data. "
                    f"Available columns: {numerical_df.columns.tolist()}"
                )

        full_starts = numerical_df[self.column_config.start_date_col].to_numpy()
        full_ends = numerical_df[self.column_config.end_date_col].to_numpy()

        window_len = self.context_len + self.horizon_len
        text_patches_num = self.context_len // self.patch_len
        shifts = range(self.patch_len) if self.augment else range(1)

        for column in numeric_cols:
            sanitized = self._sanitize_series(
                numerical_df[column].to_numpy(), full_starts, full_ends
            )
            if sanitized is None:
                continue
            ts_data, start_dates, end_dates = sanitized
            if len(ts_data) < window_len:
                continue

            # Parse window boundary dates once per column, PER VALUE via str()
            # like the reference's per-window pd.to_datetime(str(v)) — a
            # whole-Series parse misreads integer date columns as epoch
            # nanoseconds and rejects mixed formats.
            start_dt = np.array(
                [pd.to_datetime(str(v)).to_datetime64() for v in start_dates]
            )
            end_dt = np.array([pd.to_datetime(str(v)).to_datetime64() for v in end_dates])

            for shift in shifts:
                for start_index in range(shift, len(ts_data) - window_len + 1, self.horizon_len):
                    context_end = start_index + self.context_len
                    context = ts_data[start_index:context_end]
                    horizon = ts_data[context_end : context_end + self.horizon_len]

                    ctx_norm, hor_norm, mean, std = self._zscore_window(context, horizon)
                    patched_texts = self._patched_texts(
                        start_dt[start_index], end_dt[context_end - 1], tables, text_patches_num
                    )

                    self.data.append(
                        RawSample(
                            context=ctx_norm.astype(np.float32),
                            horizon=hor_norm.astype(np.float32),
                            patched_texts=patched_texts,
                            metadata={
                                "domain": self.domain,
                                "column": column,
                                "shift": shift,
                                "start_index": start_index,
                                "mean": mean,
                                "std": std,
                            },
                        )
                    )

    def _load_data(self) -> None:
        numerical_file = self.data_dir / "numerical" / self.domain / f"{self.domain}.csv"
        textual_dir = self.data_dir / "textual" / self.domain
        if not numerical_file.exists():
            raise FileNotFoundError(f"Numerical data file not found: {numerical_file}")

        numerical_df = pd.read_csv(numerical_file)
        start_col = self.column_config.start_date_col
        if start_col in numerical_df.columns:
            numerical_df = numerical_df.sort_values(start_col).reset_index(drop=True)

        tables: list[_TextTable] = []
        report_file = textual_dir / f"{self.domain}_report.csv"
        search_file = textual_dir / f"{self.domain}_search.csv"
        if report_file.exists():
            table = _TextTable.build(pd.read_csv(report_file), "Report: ", "Report Prediction: ")
            if table is not None:
                tables.append(table)
        if search_file.exists():
            table = _TextTable.build(pd.read_csv(search_file), "Search: ", "Search prediction: ")
            if table is not None:
                tables.append(table)

        self._process_data(numerical_df, tables)

    @classmethod
    def get_domains(cls, path: Path) -> list[str]:
        """Sorted domain names found under ``numerical/`` (reference ``:378-397``)."""
        numerical_dir = Path(path) / "numerical"
        if not numerical_dir.exists():
            raise FileNotFoundError(f"Numerical data directory not found: {numerical_dir}")
        return sorted(d.name for d in numerical_dir.iterdir() if d.is_dir())

    def __getitem__(self, index: int) -> RawSample:
        if index >= len(self.data):
            raise IndexError(f"Index {index} out of range for dataset of size {len(self.data)}")
        return self.data[index]

    def __len__(self) -> int:
        return len(self.data)
