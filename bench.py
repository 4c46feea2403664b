"""Headline benchmark: 2D FPE NIO training-step throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's benchmarked setup (``2d_FPE/train_nio.py``): NIOFP2D
(width 12, modes 32, n_basis 25, 3 FNO layers), batch 4, L=100 snapshots on a 61x61
grid, Adam. The measured quantity is full training steps/sec (forward + backward +
optimizer update) on one chip.

Baseline: the reference publishes no throughput numbers (BASELINE.md). The anchor is
MEASURED on this host by ``scripts/bench_torch_baseline.py`` (a faithful torch
restatement of the reference model/step at the same config, run on host CPU; results
committed in ``runs/logs/torch_baseline.json``), scaled to an A100 estimate:
``A100_EST = torch_cpu_steps_per_sec * CPU_TO_A100``. CPU_TO_A100 = 165 is the assumed
A100-vs-this-host speedup for this op mix (hundreds of small-batch cuDNN convs with up
to 512 channels + cuFFT FNO layers): measured torch-CPU is 0.073 steps/s (13.7 s/step,
runs/logs/torch_baseline.json), and an A100 sustaining ~25 TF effective on the step's
~2 TFLOP of work gives ~12 steps/s — factor 165. This deliberately GENEROUS baseline
(an A100 beating a CPU by 165x) matches the independent component-level estimate used
in round 1, so vs_baseline is comparable across rounds and conservative in the
baseline's favor. If the measured file is absent, falls back to the fixed 12 steps/s.
The JSON line also reports measured FLOPs/step (XLA cost analysis) and achieved
TFLOP/s so the claim is auditable independent of any baseline assumption.
"""
import json
import os
import time

import numpy as np

CPU_TO_A100 = 165.0
FALLBACK_A100_EST = 12.0


def a100_baseline_steps_per_sec():
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "runs", "logs", "torch_baseline.json")
    try:
        with open(path) as fh:
            measured = json.load(fh)["torch_cpu_steps_per_sec"]
        return measured * CPU_TO_A100, f"torch_cpu {measured:.3f}/s x {CPU_TO_A100:.0f}"
    except (OSError, KeyError, ValueError):
        return FALLBACK_A100_EST, "fixed estimate (torch_baseline.json absent)"


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from blindno.models.nio2d import NIOFP2D

    model = NIOFP2D(width=12, modes=32, n_basis=25, neurons=100, fno_layers=3)
    rng = np.random.default_rng(0)
    b, l, n = 4, 100, 61
    x = jnp.asarray(rng.standard_normal((b, l, n, n)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, n, n, 2)).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    grid = jnp.asarray(np.stack([gx, gy], 2).astype(np.float32))

    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, grid)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, xb, yb, key):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, xb, grid, training=True,
                rngs={"sample": key}, mutable=["batch_stats"],
            )
            return jnp.mean((out - yb) ** 2), updates["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    key = jax.random.PRNGKey(2)
    # warmup / compile
    for i in range(3):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, x, y, k)
    jax.block_until_ready(loss)

    # measured FLOPs per step from XLA's cost model (auditable perf basis)
    try:
        compiled = train_step.lower(params, batch_stats, opt_state, x, y, key).compile()
        flops = float(compiled.cost_analysis()["flops"])
    except Exception:
        flops = float("nan")

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, x, y, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    sps = n_steps / dt
    baseline, basis = a100_baseline_steps_per_sec()
    print(json.dumps({
        "metric": "2d_fpe_nio_train_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / baseline, 3),
        "baseline_steps_per_sec": round(baseline, 3),
        "baseline_basis": basis,
        "flops_per_step": flops,
        "achieved_tflops_per_sec": round(sps * flops / 1e12, 2) if np.isfinite(flops) else None,
    }))


if __name__ == "__main__":
    main()
