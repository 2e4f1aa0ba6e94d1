#!/usr/bin/env python3
"""Hyperparameter tuning for baseline (backbone fine-tune) forecasting.

Same CLI and flow as ``tune_time_mmd_sweep.py`` with mode="baseline": the
adapter is fine-tuned, fusion is unused, and datasets are consumed without
text embeddings (reference ``/root/reference/scripts/tune_baseline_sweep.py``).
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import scripts.tune_time_mmd_sweep as multimodal_sweep  # noqa: E402

if __name__ == "__main__":
    sys.argv[0] = __file__
    raise SystemExit(multimodal_sweep.main(mode="baseline"))
