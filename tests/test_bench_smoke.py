"""bench.py must never crash: the round driver runs it unattended at round end.

Runs the bench harness as a subprocess (jitted init, timed per-step loop, JSON
composition) at tiny shapes on the CPU backend (``BLINDNO_BENCH_CPU=1``) and
checks the one-JSON-line output contract. ``BLINDNO_BENCH_SMOKE=1`` skips the
cost-analysis recompile and the scanned-epoch figure — each is a separate full
compile of the NIOFP2D train step, and ONE such compile already takes ~20-30 min
on the 1-core CPU host. Gated slow in conftest for the same reason."""
import json
import os
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_bench_json_contract():
    env = dict(
        os.environ,
        BLINDNO_BENCH_CPU="1",
        BLINDNO_BENCH_SMOKE="1",
        BLINDNO_BENCH_STEPS="2",
        BLINDNO_BENCH_B="2",
        BLINDNO_BENCH_L="60",  # subsample_set draws L ~ U{50..L-1}: needs L > 50
    )
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=3600, cwd=REPO,
    )
    assert r.returncode == 0, f"bench.py crashed:\n{r.stderr[-3000:]}"
    line = r.stdout.strip().splitlines()[-1]
    d = json.loads(line)
    # the driver's contract: one JSON line with these fields
    assert d["metric"] == "2d_fpe_nio_train_steps_per_sec"
    assert d["unit"] == "steps/s"
    assert np.isfinite(d["value"]) and d["value"] > 0
    assert np.isfinite(d["vs_baseline"]) and d["vs_baseline"] > 0
    lo, hi = d["vs_baseline_range"]
    assert 0 < lo <= hi
    # secondary scanned figure: either computed and positive, or None (guarded)
    if d["steps_per_sec_scanned"] is not None:
        assert d["steps_per_sec_scanned"] > 0
    # flops may be NaN if cost analysis is unavailable, but the key must exist
    assert "flops_per_step" in d and "mfu_vs_v5e_bf16_peak" in d


def test_bf16_validation_gate(tmp_path):
    """The headline may only flip to bf16 when the committed validation summary
    shows the bf16-trained row within the 5% seed-noise band of the f32 row."""
    import importlib.util

    spec = importlib.util.spec_from_file_location("bench", os.path.join(REPO, "bench.py"))
    bench = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bench)

    # absent summary -> no validation record at all
    assert bench.bf16_validation(str(tmp_path / "missing.json")) is None

    def gate(bf16_best, f32_best):
        p = tmp_path / "s.json"
        p.write_text(json.dumps({"best_test_loss": bf16_best, "f32_row_best": f32_best}))
        return bench.bf16_validation(str(p))

    assert gate(0.18, 0.18)["passed"] is True        # equal accuracy
    assert gate(0.188, 0.18)["passed"] is True       # within the 1.05x band
    assert gate(0.20, 0.18)["passed"] is False       # outside the band
    # malformed summaries (f32 row missing / None) must not crash the bench
    p = tmp_path / "s.json"
    p.write_text(json.dumps({"best_test_loss": 0.18, "f32_row_best": None}))
    assert bench.bf16_validation(str(p)) is None
