"""Golden-value tests for the Time-MMD loader on tiny synthetic CSVs."""

import numpy as np
import pandas as pd
import pytest

from examples.time_mmd.data.time_mmd_dataset import TimeMmdDataset, _clean_text

PATCH, CONTEXT, HORIZON = 4, 8, 4


def _write_domain(root, domain, values, start_dates, end_dates, reports=None, search=None):
    num_dir = root / "numerical" / domain
    num_dir.mkdir(parents=True, exist_ok=True)
    pd.DataFrame(
        {"start_date": start_dates, "end_date": end_dates, "OT": values}
    ).to_csv(num_dir / f"{domain}.csv", index=False)
    txt_dir = root / "textual" / domain
    txt_dir.mkdir(parents=True, exist_ok=True)
    if reports is not None:
        pd.DataFrame(reports).to_csv(txt_dir / f"{domain}_report.csv", index=False)
    if search is not None:
        pd.DataFrame(search).to_csv(txt_dir / f"{domain}_search.csv", index=False)


def _dates(n, start="2020-01-01"):
    dates = pd.date_range(start, periods=n, freq="D")
    return dates.strftime("%Y-%m-%d").tolist(), dates.strftime("%Y-%m-%d").tolist()


@pytest.fixture()
def simple_domain(tmp_path):
    n = 20
    starts, ends = _dates(n)
    _write_domain(tmp_path, "Env", np.arange(n, dtype=float), starts, ends)
    return tmp_path


def test_window_count_and_stride(simple_domain):
    ds = TimeMmdDataset(simple_domain, "Env", PATCH, CONTEXT, HORIZON)
    # start_index in range(0, 20 - 12 + 1, 4) -> 0, 4, 8
    assert len(ds) == 3
    assert [s["metadata"]["start_index"] for s in ds] == [0, 4, 8]


def test_zscore_uses_context_stats_only(simple_domain):
    ds = TimeMmdDataset(simple_domain, "Env", PATCH, CONTEXT, HORIZON)
    s = ds[0]
    raw_ctx = np.arange(8, dtype=float)
    mean, std = raw_ctx.mean(), raw_ctx.std()
    np.testing.assert_allclose(s["context"], (raw_ctx - mean) / std, rtol=1e-5)
    np.testing.assert_allclose(
        s["horizon"], (np.arange(8, 12, dtype=float) - mean) / std, rtol=1e-5
    )
    assert s["metadata"]["mean"] == pytest.approx(mean)
    assert s["metadata"]["std"] == pytest.approx(std)


def test_constant_series_std_clamped(tmp_path):
    starts, ends = _dates(16)
    _write_domain(tmp_path, "Flat", np.ones(16), starts, ends)
    ds = TimeMmdDataset(tmp_path, "Flat", PATCH, CONTEXT, HORIZON)
    assert ds[0]["metadata"]["std"] == 1.0
    np.testing.assert_allclose(ds[0]["context"], 0.0)


def test_augmentation_multiplies_windows(simple_domain):
    base = TimeMmdDataset(simple_domain, "Env", PATCH, CONTEXT, HORIZON)
    aug = TimeMmdDataset(simple_domain, "Env", PATCH, CONTEXT, HORIZON, augment=True)
    # shifts 0..3; shift s yields windows starting at s, s+4, ... <= 8
    assert len(aug) > len(base)
    assert sorted(set(s["metadata"]["shift"] for s in aug)) == [0, 1, 2, 3]


def test_sanitation_trims_and_interpolates(tmp_path):
    n = 16
    starts, ends = _dates(n + 4)
    values = np.concatenate([[np.nan, np.inf], np.arange(n, dtype=float), [np.nan, np.nan]])
    values[5] = np.nan  # interior gap -> linear interpolation
    _write_domain(tmp_path, "Gappy", values, starts, ends)
    ds = TimeMmdDataset(tmp_path, "Gappy", PATCH, CONTEXT, HORIZON)
    assert len(ds) == 2  # trimmed to 16 values -> starts 0 and 4
    # interior NaN at trimmed position 3 interpolates to exactly 3.0
    raw_ctx = np.arange(8, dtype=float)
    mean, std = raw_ctx.mean(), raw_ctx.std()
    np.testing.assert_allclose(ds[0]["context"][3], (3.0 - mean) / std, rtol=1e-5)


def test_all_invalid_column_skipped(tmp_path):
    starts, ends = _dates(16)
    _write_domain(tmp_path, "Bad", [np.nan] * 16, starts, ends)
    ds = TimeMmdDataset(tmp_path, "Bad", PATCH, CONTEXT, HORIZON)
    assert len(ds) == 0


def test_too_short_series_skipped(tmp_path):
    starts, ends = _dates(8)
    _write_domain(tmp_path, "Short", np.arange(8.0), starts, ends)
    assert len(TimeMmdDataset(tmp_path, "Short", PATCH, CONTEXT, HORIZON)) == 0


def test_validation_errors(tmp_path):
    starts, ends = _dates(16)
    _write_domain(tmp_path, "Env", np.arange(16.0), starts, ends)
    with pytest.raises(ValueError, match="context_len"):
        TimeMmdDataset(tmp_path, "Env", patch_len=5, context_len=8, horizon_len=4)
    with pytest.raises(ValueError, match="horizon_len"):
        TimeMmdDataset(tmp_path, "Env", patch_len=4, context_len=8, horizon_len=5)
    with pytest.raises(FileNotFoundError):
        TimeMmdDataset(tmp_path / "nope", "Env", PATCH, CONTEXT, HORIZON)
    with pytest.raises(FileNotFoundError):
        TimeMmdDataset(tmp_path, "Missing", PATCH, CONTEXT, HORIZON)


def test_text_assignment_and_prefixes(tmp_path):
    n = 12
    starts, ends = _dates(n)
    reports = {
        "start_date": ["2020-01-01", "2020-01-06"],
        "end_date": ["2020-01-02", "2020-01-07"],
        "fact": ["early report", "late report"],
        "preds": ["early pred", None],
    }
    search = {
        "start_date": ["2020-01-06"],
        "end_date": ["2020-01-06"],
        "fact": ["late search"],
    }
    _write_domain(tmp_path, "Env", np.arange(n, dtype=float), starts, ends, reports, search)
    ds = TimeMmdDataset(tmp_path, "Env", PATCH, CONTEXT, HORIZON)
    s = ds[0]  # window covers 2020-01-01 .. 2020-01-08 (context end)
    assert len(s["patched_texts"]) == CONTEXT // PATCH == 2
    # First half-period (jan 1 - jan 4.5): only the early report overlaps.
    assert s["patched_texts"][0] == ["Report: early report", "Report Prediction: early pred"]
    # Second half-period (jan 4.5 - jan 8): late report + search; reports first.
    assert s["patched_texts"][1] == ["Report: late report", "Search: late search"]


def test_text_cleaning_rules():
    assert _clean_text(None) is None
    assert _clean_text(float("nan")) is None
    assert _clean_text("   ") is None
    assert _clean_text("NA") is None
    assert _clean_text("NA - no info") is None
    assert _clean_text("  hello  ") == "hello"
    assert _clean_text(42) == "42"


def test_get_domains(tmp_path):
    for d in ["B", "A"]:
        (tmp_path / "numerical" / d).mkdir(parents=True)
    assert TimeMmdDataset.get_domains(tmp_path) == ["A", "B"]
    with pytest.raises(FileNotFoundError):
        TimeMmdDataset.get_domains(tmp_path / "nope")
