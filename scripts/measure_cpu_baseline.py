#!/usr/bin/env python3
"""Measure the torch-CPU reference-equivalent throughput for BASELINE_MEASURED.json.

The upstream reference cannot run here (its ``timesfm``/``chronos`` pip deps
are not installed and the environment has no egress), so the baseline is the
torch mirror in tests/torch_reference.py executing the reference's training
procedure (eager per-batch loop, frozen 200M backbone, fusion-only AdamW —
``/root/reference/src/tsfmx/trainer.py:185-245``) on CPU.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np
import torch

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_timesfm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

from tests.torch_reference import TorchFusion, TorchTimesFM  # noqa: E402


def main() -> int:
    parser = argparse.ArgumentParser()
    parser.add_argument("--batch-size", type=int, default=64)
    parser.add_argument("--num-batches", type=int, default=3)
    parser.add_argument("--context", type=int, default=32)
    parser.add_argument("--horizon", type=int, default=32)
    args = parser.parse_args()

    torch.manual_seed(0)
    model = TorchTimesFM()  # full 200M geometry
    fusion = TorchFusion(384, 1280)
    for p in model.parameters():
        p.requires_grad = False

    optimizer = torch.optim.AdamW(fusion.parameters(), lr=1e-4)
    loss_fn = torch.nn.MSELoss()
    rng = np.random.default_rng(0)
    num_patches = args.context // model.p

    def batch():
        return (
            torch.from_numpy(rng.normal(size=(args.batch_size, args.context)).astype(np.float32)),
            torch.from_numpy(rng.normal(size=(args.batch_size, args.horizon)).astype(np.float32)),
            torch.from_numpy(
                rng.normal(size=(args.batch_size, num_patches, 384)).astype(np.float32)
            ),
        )

    # warmup
    ctx, hor, text = batch()
    masks = torch.zeros_like(ctx, dtype=torch.bool)
    preds = model(args.horizon, ctx, masks, text, fusion)[..., model.decode_index]
    loss = loss_fn(preds, hor)
    loss.backward()
    optimizer.step()
    optimizer.zero_grad()

    t0 = time.perf_counter()
    for _ in range(args.num_batches):
        ctx, hor, text = batch()
        masks = torch.zeros_like(ctx, dtype=torch.bool)
        preds = model(args.horizon, ctx, masks, text, fusion)[..., model.decode_index]
        loss = loss_fn(preds, hor)
        loss.backward()
        optimizer.step()
        optimizer.zero_grad()
    elapsed = time.perf_counter() - t0
    sps = args.num_batches * args.batch_size / elapsed

    out = {
        "torch_cpu_series_per_sec": round(sps, 3),
        "workload": "timesfm-200m multimodal fine-tune, batch %d, context %d, horizon %d"
        % (args.batch_size, args.context, args.horizon),
        "note": "torch mirror of the same architecture (tests/torch_reference.py); "
        "upstream reference deps unavailable offline",
        "torch_threads": torch.get_num_threads(),
    }
    path = Path(__file__).resolve().parent.parent / "BASELINE_MEASURED.json"
    path.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
