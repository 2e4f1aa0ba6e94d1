"""bench.py contract tests: the driver consumes its single JSON stdout line.

Runs the tiny-geometry headline in a subprocess (CPU) and checks the JSON
schema; unit-tests the analytic FLOPs estimators against hand-derived values.
"""

import json
import os
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import bench  # noqa: E402
from multimodal_timesfm_tpu.models.chronos import Chronos2Config  # noqa: E402
from multimodal_timesfm_tpu.models.timesfm import TimesFMConfig  # noqa: E402


def test_timesfm_flops_estimate_matches_hand_derivation():
    # 200M geometry at context 32 (1 patch token), multimodal training:
    # fwd ~ 0.21 GFLOP (the seq==1 path skips the dead q/k projections AND
    # the trainer folds the frozen v+out product into one GEMM per layer —
    # fold_seq1_attention) -> x2 for the frozen-backbone input-grad path.
    cfg = TimesFMConfig()
    flops = bench.timesfm_flops_per_series(cfg, 32, "multimodal")
    assert 0.40e9 < flops < 0.45e9
    # baseline keeps the separate v/out factors (they train) AND adds the
    # dW matmuls (~3x fwd): well above the folded multimodal count.
    assert bench.timesfm_flops_per_series(cfg, 32, "baseline") > 3.0 / 2.0 * flops
    # run_workload passes the trainer's ACTUAL fold state; fold off counts
    # the separate v+out GEMMs (the MTT_BENCH_NO_FOLD A/B measures this).
    unfolded = bench.timesfm_flops_per_series(cfg, 32, "multimodal", fold=False)
    assert unfolded > flops
    expected_delta = 2 * 2 * cfg.model_dims * cfg.model_dims * cfg.num_layers  # x2 bwd
    assert abs((unfolded - flops) - expected_delta) < 1e-6 * expected_delta
    # 16x the tokens AND the q/k projections back -> far more than 16x
    assert bench.timesfm_flops_per_series(cfg, 512, "multimodal") > 16 * flops * 0.99


def test_chronos_flops_estimate_scales_with_mop():
    import dataclasses

    cfg = Chronos2Config()
    full = bench.chronos_flops_per_series(cfg, 32, "multimodal")
    short = bench.chronos_flops_per_series(
        dataclasses.replace(cfg, max_output_patches=2), 32, "multimodal"
    )
    assert full > 5 * short  # mop 64 -> 2 cuts the token count ~13x


def test_workload_table_includes_attention_regimes():
    assert bench.HEADLINE in bench.WORKLOADS
    contexts = {bench.WORKLOADS[n][1] for n in bench.WORKLOADS if n.startswith("timesfm")}
    assert {32, 512, 2048} <= contexts  # >=256 patch-token regime engages Pallas
    assert any(bench.WORKLOADS[n][0] == "chronos" for n in bench.WORKLOADS)


def test_backend_retry_reexecs_with_decremented_budget(monkeypatch):
    # Transient tunnel failure: re-exec the same argv with one fewer retry.
    monkeypatch.setenv("MTT_BACKEND_INIT_RETRIES", "2")
    monkeypatch.setenv("MTT_BACKEND_RETRY_DELAY", "0")
    calls = {}
    bench._retry_or_exit(
        "simulated outage",
        sleep_fn=lambda s: calls.setdefault("slept", s),
        exec_fn=lambda exe, argv, env: calls.update(exe=exe, argv=argv, env=env),
    )
    assert calls["exe"] == sys.executable
    assert calls["argv"][0] == sys.executable
    assert calls["env"]["MTT_BACKEND_INIT_RETRIES"] == "1"

    # Exhausted budget: exit 2, no exec.
    monkeypatch.setenv("MTT_BACKEND_INIT_RETRIES", "0")
    import pytest

    with pytest.raises(SystemExit) as exc:
        bench._retry_or_exit("simulated outage", exec_fn=lambda *a: calls.update(bad=True))
    assert exc.value.code == 2
    assert "bad" not in calls


def test_kernel_check_passes_on_cpu(capsys):
    """--kernel-check runs both Pallas paths vs the XLA oracle and exits 0.

    On CPU this exercises the interpreter (math parity + the flag's
    plumbing); the lowering-rejection detection it exists for needs the
    real TPU — run `python bench.py --kernel-check` there after any
    kernel/BlockSpec edit (docs/PERF.md records the regression class).
    """
    assert bench.kernel_check("bfloat16") == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["metric"] == "attention_kernel_check"
    assert payload["failures"] == 0
    assert {r["path"] for r in payload["rows"]} == {
        "whole-seq", "flash", "qkv-fused-16", "qkv-fused-64",
        "chronos-rowtile-72",
    }
    assert all(r["ok"] for r in payload["rows"])


def test_bench_headline_json_contract():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    proc = subprocess.run(
        [sys.executable, "bench.py", "--tiny", "--workloads", "headline"],
        cwd=REPO,
        env=env,
        capture_output=True,
        text=True,
        # Generous: the tiny CPU bench takes ~90s alone but this box has ONE
        # core — a concurrent compile/test elsewhere starves the subprocess.
        timeout=1500,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.strip()]
    assert len(lines) == 1, f"bench must print exactly ONE stdout line, got: {lines}"
    payload = json.loads(lines[0])
    # --tiny rewrites the geometry, so the metric carries the _tiny suffix
    # and there is no vs_baseline (the full-geometry comparison would lie);
    # the driver's real run (no --tiny) prints the unsuffixed metric.
    assert payload["metric"] == "timemmd_multimodal_finetune_series_per_sec_tiny"
    assert payload["vs_baseline"] is None
    assert payload["unit"] == "series/sec"
    assert payload["value"] > 0
    assert "torch-CPU mirror" in payload["baseline_kind"]
    assert "flops_per_series" in payload and payload["flops_per_series"] > 0
    assert "mfu" in payload and "workloads" in payload
