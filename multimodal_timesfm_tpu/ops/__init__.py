"""Compute ops layer: RevIN/masked running statistics, patching, attention kernels.

The TPU-native equivalents of the reference's hot loops (SURVEY.md §3.5):
the per-patch Welford python loop (``/root/reference/src/tsfmx/tsfm/timesfm.py:63-66``)
becomes closed-form cumulative masked moments (one pass of cumsums on the
VPU), and the transformer attention gets a Pallas fused kernel path.
"""

from multimodal_timesfm_tpu.ops.revin import (  # noqa: F401
    masked_running_stats,
    masked_running_stats_scan,
    revin,
)
from multimodal_timesfm_tpu.ops.patching import patchify, unpatchify  # noqa: F401
