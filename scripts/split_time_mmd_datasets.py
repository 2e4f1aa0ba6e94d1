#!/usr/bin/env python3
"""Split Time-MMD numerical data chronologically; duplicate textual data per split.

CLI parity with the reference (``/root/reference/scripts/split_time_mmd_datasets.py``):
each domain's numerical CSV is sorted by its date column and sliced by row
ratios into sibling ``{domain}_{split}`` directories; textual CSVs are copied
whole into each split directory with renamed files (texts are filtered by
window dates at load time, so they are not split).
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import pandas as pd

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from examples.time_mmd.configs.domain_columns import DEFAULT_TIME_MMD_CONFIGS  # noqa: E402
from examples.time_mmd.data.time_mmd_dataset import TimeMmdDataset  # noqa: E402
from multimodal_timesfm_tpu.utils.logging import setup_logger  # noqa: E402

_logger = setup_logger()

SPLITS = ("train", "val", "test")


def _parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(
        description="Split Time-MMD dataset into train / val / test sets."
    )
    parser.add_argument("--data-path", type=str, default="data/Time-MMD")
    parser.add_argument("--train-ratio", type=float, required=True)
    parser.add_argument("--val-ratio", type=float, required=True)
    parser.add_argument("--domains", type=str, nargs="+")
    parser.add_argument("--force-rebuild", action="store_true")
    return parser.parse_args()


def split_numerical(
    numerical_dir: Path, domain: str, train_ratio: float, val_ratio: float, force: bool
) -> None:
    src = numerical_dir / domain / f"{domain}.csv"
    if not src.exists():
        _logger.warning("Numerical file not found, skipping: %s", src)
        return

    df = pd.read_csv(src)
    date_col = DEFAULT_TIME_MMD_CONFIGS.get_config_for_domain(domain).start_date_col
    if date_col not in df.columns:
        _logger.error("Date column %r not found in %s — cannot split chronologically", date_col, src)
        return
    df = df.sort_values(date_col).reset_index(drop=True)

    n = len(df)
    train_end = int(n * train_ratio)
    val_end = int(n * (train_ratio + val_ratio))
    slices = {
        "train": df.iloc[:train_end],
        "val": df.iloc[train_end:val_end],
        "test": df.iloc[val_end:],
    }

    for split in SPLITS:
        split_domain = f"{domain}_{split}"
        out_path = numerical_dir / split_domain / f"{split_domain}.csv"
        out_path.parent.mkdir(parents=True, exist_ok=True)
        if out_path.exists() and not force:
            _logger.info("Skip (exists): %s", out_path)
            continue
        slices[split].reset_index(drop=True).to_csv(out_path, index=False)
        _logger.info("Wrote: %s (%d rows)", out_path, len(slices[split]))


def duplicate_textual(textual_dir: Path, domain: str, force: bool) -> None:
    domain_dir = textual_dir / domain
    if not domain_dir.exists():
        _logger.warning("Textual directory not found, skipping: %s", domain_dir)
        return
    for src in sorted(domain_dir.glob("*.csv")):
        # "{domain}_report.csv" -> suffix "report"
        suffix = src.stem.removeprefix(f"{domain}_")
        for split in SPLITS:
            split_domain = f"{domain}_{split}"
            out_path = textual_dir / split_domain / f"{split_domain}_{suffix}.csv"
            out_path.parent.mkdir(parents=True, exist_ok=True)
            if out_path.exists() and not force:
                _logger.info("Skip (exists): %s", out_path)
                continue
            out_path.write_bytes(src.read_bytes())
            _logger.info("Copied: %s -> %s", src, out_path)


def main() -> int:
    args = _parse_args()
    if args.train_ratio + args.val_ratio >= 1.0:
        _logger.error("train_ratio + val_ratio must be < 1.0")
        return 1

    data_path = Path(args.data_path)
    if args.domains:
        domains = args.domains  # explicit requests are honored unconditionally
    else:
        # Auto-discovery must never re-split previous split outputs.
        domains = [
            d
            for d in TimeMmdDataset.get_domains(data_path)
            if not d.endswith(("_train", "_val", "_test"))
        ]

    for domain in domains:
        _logger.info("Splitting domain %s", domain)
        split_numerical(
            data_path / "numerical", domain, args.train_ratio, args.val_ratio, args.force_rebuild
        )
        duplicate_textual(data_path / "textual", domain, args.force_rebuild)

    _logger.info("Done")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
