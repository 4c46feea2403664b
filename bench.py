"""Headline benchmark: 2D FPE NIO training-step throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's benchmarked setup (``2d_FPE/train_nio.py``): NIOFP2D
(width 12, modes 32, n_basis 25, 3 FNO layers), batch 4, L=100 snapshots on a 61x61
grid, Adam. The measured quantity is full training steps/sec (forward + backward +
optimizer update) on one chip.

Compute dtype of the headline step (BASELINE.md contract): the framework ships an
accuracy-validated mixed-precision training mode (``TrainConfig.compute_dtype=
"bfloat16"``, f32 master params/Adam/batch-stats — blindno/train/loop.py). The
headline step uses that mode ONLY once a full registry-config suite row trained with
it matches the f32 row's accuracy (the round-4 queue's ``fpe1d/nio bf16 validation``
stage writes ``runs/logs/fpe1d_nio_bf16val_summary.json``; the gate is best test
rel-L2 within 5%% of the f32 row — the measured seed-noise band for identical-config
reruns). Until that file exists and passes, the headline stays f32. When the headline
is bf16, the f32 figure is reported alongside as ``steps_per_sec_f32``. This is a
system-level comparison: the reference trains in torch-default precision (TF32 convs
on A100) and ships no mixed-precision option, so its anchor keeps its own precision
while this framework benchmarks its best accuracy-validated configuration.
``BLINDNO_BENCH_F32=1`` forces the f32 headline regardless.

Baseline: the reference publishes no throughput numbers (BASELINE.md) and was run on
unspecified CUDA GPUs, so the A100 anchor is DERIVED, not measured — from two
committed measurements plus one cited assumption, so a skeptic can recompute it:

1. ``torch_flops_per_step`` — conv/matmul FLOPs of a faithful torch restatement of
   the reference step (``scripts/bench_torch_baseline.py``, torch FlopCounterMode,
   forward+backward, committed in ``runs/logs/torch_baseline.json``). FFT/elementwise
   FLOPs are not counted, which errs in the baseline's favor (fewer FLOPs -> faster
   estimated A100).
2. ``A100_EFF_TFLOPS`` — the assumed sustained A100 throughput band for this op mix:
   hundreds of small-batch cuDNN convs (B*L ~= 300 images of 61x61, up to 512
   channels) + cuFFT FNO layers + BatchNorm, with per-layer kernel launches. torch
   defaults run cuDNN convs in TF32 (156 TF/s peak); sustained utilization for such
   small-batch research mixes is typically 10-30%% of that peak -> a 15-45 TF/s
   effective band.
3. ``A100_est_steps/s = eff_tflops * 1e12 / torch_flops_per_step``.

``vs_baseline`` is quoted at the band's geometric mean (26 TF/s);
``vs_baseline_range`` spans the band, with the LOW end the claim's conservative bound
(A100 at 45 TF/s effective). The old round-1/2 anchor (torch-CPU steps/s x 165) is
retained in the JSON for cross-round comparability but no longer feeds the headline —
it baked in a "~2 TFLOP" narrative that disagreed with the XLA-counted FLOPs of OUR
step (0.76 TFLOP; the two implementations legitimately differ: ours runs all 100
snapshots per step with masked subsampling and DFT-matmul spectral convs, torch runs
~75 and cuFFT). The JSON also reports our measured FLOPs/step (XLA cost analysis),
achieved TFLOP/s, and MFU vs the v5e 197 TF/s bf16 peak.
"""
import json
import os
import time

import numpy as np

A100_EFF_TFLOPS = (15.0, 45.0)  # cited sustained band for this small-batch conv mix
CPU_TO_A100 = 165.0  # legacy round-1/2 scaling, reported for comparability only
FALLBACK_A100_EST = 12.0
V5E_BF16_PEAK_TFLOPS = 197.0
BF16_ACCURACY_TOL = 1.05  # within the measured identical-config seed-noise band

REPO = os.path.dirname(os.path.abspath(__file__))


def a100_baseline_steps_per_sec():
    """Returns (mid, low, high, basis): estimated A100 steps/s for the torch step."""
    path = os.path.join(REPO, "runs", "logs", "torch_baseline.json")
    try:
        with open(path) as fh:
            d = json.load(fh)
    except OSError:
        d = {}
    if "torch_flops_per_step" in d:
        f = float(d["torch_flops_per_step"])
        lo_tf, hi_tf = A100_EFF_TFLOPS
        mid_tf = (lo_tf * hi_tf) ** 0.5
        return (mid_tf * 1e12 / f, lo_tf * 1e12 / f, hi_tf * 1e12 / f,
                f"{f/1e12:.3f} TFLOP/step (FlopCounterMode) / {lo_tf:.0f}-{hi_tf:.0f} TF/s A100 band")
    if "torch_cpu_steps_per_sec" in d:
        est = float(d["torch_cpu_steps_per_sec"]) * CPU_TO_A100
        return est, est, est, f"torch_cpu {d['torch_cpu_steps_per_sec']:.3f}/s x {CPU_TO_A100:.0f} (legacy)"
    return (FALLBACK_A100_EST,) * 3 + ("fixed estimate (torch_baseline.json absent)",)


def bf16_validation(path=None):
    """The BASELINE.md headline gate: a full registry-config suite row trained with
    ``TrainConfig.compute_dtype='bfloat16'`` must match the f32 row's accuracy.
    Reads the round-4 queue's validation summary; returns a dict describing the
    gate (with ``passed``) or None if the validation has not been run."""
    if path is None:
        path = os.path.join(REPO, "runs", "logs", "fpe1d_nio_bf16val_summary.json")
    try:
        with open(path) as fh:
            d = json.load(fh)
        bf16_best = float(d["best_test_loss"])
        f32_best = float(d["f32_row_best"])
    except (OSError, KeyError, TypeError, ValueError):
        return None
    return {
        "suite_row": "fpe1d/nio (registry config, 400 epochs)",
        "bf16_best_test_rel_l2": round(bf16_best, 6),
        "f32_best_test_rel_l2": round(f32_best, 6),
        "criterion": f"bf16 <= {BF16_ACCURACY_TOL:.2f} x f32 (identical-config seed-noise band)",
        "passed": bool(bf16_best <= BF16_ACCURACY_TOL * f32_best),
        # the validated TrainConfig.amp_policy — the headline step must run the SAME
        # cast policy the accuracy gate was earned with (round 4 validated "all" and
        # FAILED; round 5 validates the profile-guided "encoder" policy)
        "amp_policy": d.get("amp_policy", "all"),
    }


def main():
    import jax

    if os.environ.get("BLINDNO_BENCH_CPU"):
        # offline harness testing on the 1-core host (sitecustomize pre-imports
        # JAX on the axon TPU platform, so JAX_PLATFORMS env alone is ignored)
        jax.config.update("jax_platforms", "cpu")
    import jax.lax as lax
    import jax.numpy as jnp
    import optax
    from functools import partial

    from blindno.models.nio2d import NIOFP2D

    model = NIOFP2D(width=12, modes=32, n_basis=25, neurons=100, fno_layers=3)
    rng = np.random.default_rng(0)
    # BLINDNO_BENCH_{B,L} shrink batch/snapshot count for the offline CPU smoke
    # test (tests/test_bench_smoke.py: the driver runs this file unattended at
    # round end, so its whole flow is regression-tested). The headline TPU run
    # uses the reference-matched defaults; the grid stays 61x61 (modes=32 needs it).
    b = int(os.environ.get("BLINDNO_BENCH_B", "4"))
    l = int(os.environ.get("BLINDNO_BENCH_L", "100"))
    n = 61
    x = jnp.asarray(rng.standard_normal((b, l, n, n)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, n, n, 2)).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    grid = jnp.asarray(np.stack([gx, gy], 2).astype(np.float32))

    # jitted init: un-jitted flax init dispatches thousands of tiny ops over the
    # single-chip tunnel (minutes); one compiled program is seconds
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, grid)
    host_vars = jax.device_get(variables)  # pristine copy: each mode re-places it
    tx = optax.adam(5e-4)

    n_steps = int(os.environ.get("BLINDNO_BENCH_STEPS", "30"))
    smoke = bool(os.environ.get("BLINDNO_BENCH_SMOKE"))
    # Pre-split all step keys OUTSIDE the timed region: a per-iteration
    # jax.random.split is a tiny extra dispatch whose round-trip latency is pure
    # harness artifact (the r04 profile showed a ~1.7 ms/step host gap), not part
    # of the training step being measured.
    all_keys = list(jax.random.split(jax.random.PRNGKey(2), n_steps + 3))
    warm_keys, step_keys = all_keys[:3], all_keys[3:]

    def make_step(cdtype, amp_policy="all"):
        """The (un-jitted) bench step body, mirroring blindno/train/loop.py
        train_loss_and_grads exactly: the (optional) cast — via the train loop's own
        amp_cast_fns, honoring the validated amp_policy — lives INSIDE the loss
        closure, so autodiff accumulates gradients back to f32 master params; batch
        stats are re-cast to f32 so the training state never changes dtype."""
        if cdtype is None:
            cast = uncast = lambda t: t
            in_dtype = jnp.float32
        else:
            from blindno.train.loop import amp_cast_fns

            cast, uncast = amp_cast_fns(cdtype, amp_policy)
            in_dtype = cdtype

        def train_step(params, batch_stats, opt_state, xb, yb, key):
            def loss_fn(p):
                out, updates = model.apply(
                    {"params": cast(p), "batch_stats": cast(batch_stats)},
                    xb.astype(in_dtype), grid, training=True,
                    rngs={"sample": key}, mutable=["batch_stats"],
                )
                return (jnp.mean((out.astype(jnp.float32) - yb) ** 2),
                        uncast(updates["batch_stats"]))

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), stats, opt_state, loss

        return train_step

    def fresh_state():
        v = jax.device_put(host_vars)
        params = v["params"]
        return params, v.get("batch_stats", {}), tx.init(params)

    def run_mode(cdtype, with_flops, amp_policy="all"):
        """Warm + time the per-step-dispatched loop for one compute dtype.
        Returns (steps/s, flops_per_step, final_state, train_step)."""
        train_step = jax.jit(make_step(cdtype, amp_policy), donate_argnums=(0, 1, 2))
        params, batch_stats, opt_state = fresh_state()
        for k in warm_keys:
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, y, k)
        jax.block_until_ready(loss)

        # measured FLOPs per step from XLA's cost model (auditable perf basis).
        # BLINDNO_BENCH_SMOKE skips this explicit lower().compile() — it is a
        # SECOND full compile of the step (the jit cache does not serve AOT
        # lowerings), and on the 1-core CPU host each compile of this graph takes
        # ~20-30 min; the JSON contract tolerates flops=NaN.
        flops = float("nan")
        if with_flops and not smoke:
            try:
                compiled = train_step.lower(
                    params, batch_stats, opt_state, x, y, warm_keys[0]).compile()
                flops = float(compiled.cost_analysis()["flops"])
            except Exception:
                pass

        t0 = time.perf_counter()
        for k in step_keys:
            params, batch_stats, opt_state, loss = train_step(
                params, batch_stats, opt_state, x, y, k)
        jax.block_until_ready(loss)
        sps = n_steps / (time.perf_counter() - t0)
        return sps, flops, (params, batch_stats, opt_state), train_step

    val = bf16_validation()
    use_bf16 = bool(val and val["passed"]) and not os.environ.get("BLINDNO_BENCH_F32")
    headline_dtype = jnp.bfloat16 if use_bf16 else None
    headline_policy = val["amp_policy"] if use_bf16 else "all"

    sps, flops, state, _ = run_mode(headline_dtype, with_flops=True, amp_policy=headline_policy)

    # Secondary figure: the same step body scanned on-device (lax.scan over the
    # step keys, one XLA program for the whole run) — pure device throughput with
    # zero per-step host dispatch. This is what the epoch-fused train loop
    # (train_epoch in blindno/train/loop.py) achieves; the headline stays the
    # per-step-dispatched loop, apples-to-apples with the reference's torch loop.
    sps_scanned = None
    if not smoke:
        step_unjit = make_step(headline_dtype, headline_policy)  # un-jitted body for the scan

        @partial(jax.jit, donate_argnums=(0, 1, 2))
        def train_scan(params, batch_stats, opt_state, xb, yb, keys):
            def body(carry, k):
                p, bs, st, _ = carry
                p, bs, st, loss = step_unjit(p, bs, st, xb, yb, k)
                return (p, bs, st, loss), None

            (p, bs, st, loss), _ = lax.scan(
                body, (*((params, batch_stats, opt_state)), jnp.float32(0.0)), keys)
            return (p, bs, st), loss

        try:
            scan_keys = jnp.stack(step_keys)
            params, batch_stats, opt_state = state
            carry, last = train_scan(params, batch_stats, opt_state, x, y, scan_keys)
            jax.block_until_ready(last)
            (params, batch_stats, opt_state) = carry
            t0 = time.perf_counter()
            carry, last = train_scan(params, batch_stats, opt_state, x, y, scan_keys)
            jax.block_until_ready(last)
            sps_scanned = n_steps / (time.perf_counter() - t0)
        except Exception:
            sps_scanned = None

    # When the headline is the validated bf16 mode, also report the f32 figure
    # (the round-3 headline) so cross-round numbers stay directly comparable.
    sps_f32 = None
    if use_bf16 and not smoke:
        try:
            sps_f32, _, _, _ = run_mode(None, with_flops=False)
        except Exception:
            sps_f32 = None

    mid, low, high, basis = a100_baseline_steps_per_sec()
    achieved_tf = sps * flops / 1e12 if np.isfinite(flops) else None
    # legacy round-1/2 anchor, for cross-round comparability of old BENCH_r*.json
    try:
        with open(os.path.join(REPO, "runs", "logs", "torch_baseline.json")) as fh:
            legacy = json.load(fh)["torch_cpu_steps_per_sec"] * CPU_TO_A100
    except (OSError, KeyError, ValueError):
        legacy = None
    print(json.dumps({
        "metric": "2d_fpe_nio_train_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / mid, 3),
        # conservative bound first (A100 at the generous 45 TF/s end of the band)
        "vs_baseline_range": [round(sps / high, 3), round(sps / low, 3)],
        "baseline_steps_per_sec": round(mid, 3),
        "baseline_steps_per_sec_range": [round(low, 3), round(high, 3)],
        "baseline_basis": basis,
        "compute_dtype": "bfloat16" if use_bf16 else "float32",
        "amp_policy": headline_policy if use_bf16 else None,
        "bf16_validation": val,
        "steps_per_sec_f32": round(sps_f32, 3) if sps_f32 else None,
        "vs_baseline_legacy_r1r2": round(sps / legacy, 3) if legacy else None,
        "steps_per_sec_scanned": round(sps_scanned, 3) if sps_scanned else None,
        "vs_baseline_scanned": round(sps_scanned / mid, 3) if sps_scanned else None,
        "flops_per_step": flops,
        "achieved_tflops_per_sec": round(achieved_tf, 2) if achieved_tf else None,
        "mfu_vs_v5e_bf16_peak": round(achieved_tf / V5E_BF16_PEAK_TFLOPS, 3) if achieved_tf else None,
    }))


if __name__ == "__main__":
    main()
