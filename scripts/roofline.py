"""Per-workload roofline accounting (round-5 perf program).

Decomposes a bench workload's per-optimizer-step time budget into the same
terms the baseline-mode roofline in docs/PERF.md used, but with the
activation-residual term measured EXACTLY instead of estimated: the script
traces the workload's real per-step gradient (``MultimodalTrainer._loss_fn``
at full geometry) and walks the grad jaxpr for every residual the scanned
backward stacks through HBM (the ``ys`` outputs of the length-L forward
scan), counting each stream once written forward and once read backward.

Terms:
  * compute: analytic required GEMM FLOPs (bench's per-series model) at a
    measured GEMM efficiency (``--eff``, default 0.75 = the headline-trace
    per-call efficiency at these (B*S, 1280) x (1280, 1280)-class shapes;
    pass the value read from this workload's own trace when available),
  * residual streams: exact stacked bytes x 2 (write + read) at HBM BW,
  * weight streams: frozen-tree weight reads (fwd + dX) in multimodal mode,
    or the full 38P parameter-traffic scheme (docs/PERF.md) in baseline mode,
  * fixed per-dispatch cost (116 ms measured, r3) amortized over the fused
    steps,
  * val passes: one forward-only batch per epoch (bench geometry).

Ceiling wall-MFU = ideal_time / total_time, ideal = FLOPs / peak. Compare
against the measured MFU in BENCH_r*.json: measured >= ~0.85 x ceiling means
the workload is bandwidth/dispatch-bound as accounted, not leaving
harvestable kernel gaps.

Usage:
    python scripts/roofline.py --workload timesfm_mm_c512 [--eff 0.75]

Runs entirely on CPU (trace only, no execution) — force with MTT_PLATFORM=cpu.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from multimodal_timesfm_tpu.utils.platform import apply_platform_env  # noqa: E402

apply_platform_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import bench  # noqa: E402

HBM_BW = 819e9  # v5e HBM bytes/s (public spec)
PEAK = 197e12  # v5e bf16 dense peak FLOP/s
FIXED_DISPATCH_S = 0.116  # measured per-dispatch fixed cost (docs/PERF.md)


def _iter_jaxprs(jaxpr):
    """Yield a jaxpr and every sub-jaxpr reachable through eqn params."""
    yield jaxpr
    for eqn in jaxpr.eqns:
        for val in eqn.params.values():
            vals = val if isinstance(val, (list, tuple)) else [val]
            for v in vals:
                inner = getattr(v, "jaxpr", None)
                if inner is not None:
                    yield from _iter_jaxprs(inner)
                elif hasattr(v, "eqns"):
                    yield from _iter_jaxprs(v)


def scan_residual_bytes(grad_jaxpr, num_layers: int) -> tuple[int, list[tuple[str, int]]]:
    """Total bytes of residual stacks the length-``num_layers`` scans output.

    In a grad jaxpr, differentiating ``lax.scan`` produces a forward scan
    whose extra ``ys`` outputs (everything past the carry) are the per-layer
    residuals, stacked with a leading ``num_layers`` axis, plus a reverse
    scan that consumes them. We count each forward-scan output whose leading
    dim is ``num_layers`` ONCE here; the caller doubles it for write + read.
    Weight-shaped ``[L, ...]`` arrays are scan *inputs* (xs), not outputs,
    so they are naturally excluded.
    """
    streams: list[tuple[str, int]] = []
    seen_eqns = set()
    for jx in _iter_jaxprs(grad_jaxpr.jaxpr):
        for eqn in jx.eqns:
            if eqn.primitive.name != "scan" or id(eqn) in seen_eqns:
                continue
            seen_eqns.add(id(eqn))
            if eqn.params.get("length") != num_layers:
                continue
            num_carry = eqn.params.get("num_carry", 0)
            for out in eqn.outvars[num_carry:]:
                aval = out.aval
                if not getattr(aval, "shape", None):
                    continue
                if aval.shape[0] != num_layers:
                    continue
                nbytes = aval.size * aval.dtype.itemsize
                streams.append((f"{aval.dtype.name}{list(aval.shape)}", nbytes))
    return sum(b for _, b in streams), streams


def tree_bytes(tree, dtype_bytes: int | None = None) -> int:
    leaves = jax.tree.leaves(tree)
    if dtype_bytes is None:
        return sum(x.size * x.dtype.itemsize for x in leaves)
    return sum(x.size * dtype_bytes for x in leaves)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", required=True, choices=sorted(bench.WORKLOADS))
    ap.add_argument(
        "--eff",
        type=float,
        default=0.75,
        help="sustained GEMM efficiency vs bf16 peak (read from this "
        "workload's trace when available; 0.75 = headline-trace default)",
    )
    ap.add_argument("--json", action="store_true", help="print one JSON line only")
    ap.add_argument(
        "--force-kernels",
        action="store_true",
        help="trace the Pallas kernel paths (gates forced on, as the TPU "
        "would route small-S attention) so the residual accounting matches "
        "the production program — the gates are backend-conditional and "
        "would otherwise pick the XLA path on this CPU trace",
    )
    args = ap.parse_args()

    if args.force_kernels:
        from multimodal_timesfm_tpu.ops import attention as _attn
        from multimodal_timesfm_tpu.ops import chronos_attention as _ca
        from multimodal_timesfm_tpu.ops import qkv_attention as _qa

        _qa.supports_qkv_fused = lambda *a, **k: True
        _ca.supports_chronos_rowtile = lambda *a, **k: True
        # Whole-seq kernel gate (the c16384 / 512-token regime): keep its
        # shape constraints, drop only the backend check.
        _supports = _attn.supports_pallas

        def _force_pallas(seq: int, dim: int) -> bool:
            return 256 <= seq <= 1024 and seq % 8 == 0 and dim <= 256

        _attn.supports_pallas = _force_pallas
        # layers.py imports the gate at call time from the module, so the
        # monkeypatch is seen; interpret=False pallas_call still TRACES fine
        # on CPU (tracing never executes the kernel).
        del _supports

    backbone, context, horizon, batch, samples, epochs, mode = bench.WORKLOADS[args.workload]
    arch = bench.WORKLOAD_ARCH.get(args.workload, {})
    # Tiny sample count: the trace depends on batch geometry only; `samples`
    # from the workload tuple still drives the fixed-cost amortization below.
    trainer, cfg = bench.build_trainer(
        backbone, context, horizon, batch, max(batch, 8), epochs, False, "bfloat16", mode, arch
    )

    compute_dtype = jnp.bfloat16
    n_patches = context // trainer.model.adapter.patch_len
    sds = lambda shape, dt: jax.ShapeDtypeStruct(shape, dt)  # noqa: E731
    text = sds((batch, n_patches, 384), jnp.float32) if mode == "multimodal" else None
    grad_jaxpr = jax.make_jaxpr(jax.grad(trainer._loss_fn))(
        trainer.state.trainable,
        trainer.frozen,
        sds((batch, context), jnp.float32),
        sds((batch, horizon), jnp.float32),
        text,
        sds((batch,), jnp.float32),
    )

    num_layers = cfg.num_layers
    res_bytes, streams = scan_residual_bytes(grad_jaxpr, num_layers)

    # --- compute term -----------------------------------------------------
    fold = getattr(trainer, "folded_seq1", False)
    if backbone == "timesfm":
        fps = bench.timesfm_flops_per_series(cfg, context, mode, fold=bool(fold))
    else:
        fps = bench.chronos_flops_per_series(cfg, context, mode, horizon=horizon)
    flops_step = fps * batch
    t_ideal = flops_step / PEAK
    t_compute = flops_step / (PEAK * args.eff)

    # --- weight / parameter traffic term ----------------------------------
    p_frozen = sum(x.size for x in jax.tree.leaves(trainer.frozen))
    p_train = sum(x.size for x in jax.tree.leaves(trainer.state.trainable))
    if mode == "multimodal":
        # Frozen tree stored bf16 (frozen_cast_dtype): read once by the fwd
        # GEMMs, once by the dX backward GEMMs.
        w_bytes = 2 * (2 * p_frozen)
        w_note = f"frozen bf16 weights fwd+dX reads (P={p_frozen/1e6:.1f}M)"
    else:
        # Full fine-tune: the 38P scheme from docs/PERF.md (fp32 masters,
        # bf16 compute copy, bf16 moments, fp32 grads + global-norm read).
        w_bytes = 38 * p_train
        w_note = f"38P parameter-traffic scheme (P={p_train/1e6:.1f}M)"
    t_weights = w_bytes / HBM_BW

    # --- residual term -----------------------------------------------------
    t_residual = 2 * res_bytes / HBM_BW

    # --- fixed + val terms --------------------------------------------------
    steps_per_epoch = samples // batch
    steps_total = steps_per_epoch * epochs
    t_fixed = FIXED_DISPATCH_S / steps_total
    fwd_share = 2.0 if mode == "multimodal" else 3.0
    n_val = max(batch, 8)
    val_flops_epoch = (fps / fwd_share) * n_val
    t_val = val_flops_epoch / (PEAK * args.eff) / steps_per_epoch

    t_total = t_compute + t_weights + t_residual + t_fixed + t_val
    ceiling_mfu = t_ideal / t_total
    ceiling_series = batch / t_total

    out = {
        "workload": args.workload,
        "batch": batch,
        "steps_per_dispatch": steps_total,
        "flops_per_series": fps,
        "gemm_eff": args.eff,
        "ms_compute": round(t_compute * 1e3, 2),
        "ms_weights": round(t_weights * 1e3, 2),
        "ms_residual": round(t_residual * 1e3, 2),
        "ms_fixed": round(t_fixed * 1e3, 2),
        "ms_val": round(t_val * 1e3, 2),
        "ms_total": round(t_total * 1e3, 2),
        "residual_stream_mb": round(res_bytes / 1e6, 1),
        "num_residual_streams": len(streams),
        "ceiling_mfu": round(ceiling_mfu, 3),
        "ceiling_series_per_sec": round(ceiling_series, 1),
        "weight_note": w_note,
    }
    print(json.dumps(out))
    if not args.json:
        print("\nResidual streams stacked through the layer scan "
              "(written fwd + read bwd):")
        for name, nbytes in sorted(streams, key=lambda t: -t[1]):
            print(f"  {name:48s} {nbytes/1e6:9.1f} MB")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
