"""Secondary throughput figure: the bench step with bf16-stored activations/params.

The round-4 profile (runs/logs/profile_r04_analysis.md) shows the 2D FPE NIO step is
HBM-bandwidth-bound streaming f32 encoder activations; bf16 storage halves that
traffic and is the only sizable lever left on one chip. This is NOT the headline
bench (bench.py stays f32-stored, matching the accuracy-validated training path):
the number here quantifies what a numerics-changed variant would buy, for the
BASELINE.md re-scope argument. Accuracy is NOT validated for this mode.

Method: identical step to bench.py, but the loss closure casts params to bf16 and
the batch is stored/fed in bf16, so every activation, conv, and weight-gradient
reduction runs in bf16 (f32 MXU accumulation, f32 Adam master params). The same
cast-in-the-loss-closure scheme is available for real trainings as
``TrainConfig.compute_dtype="bfloat16"`` (blindno/train/loop.py).

Writes runs/logs/bench_bf16_r04.json and prints one JSON line.
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from blindno.models.nio2d import NIOFP2D

    model = NIOFP2D(width=12, modes=32, n_basis=25, neurons=100, fno_layers=3)
    rng = np.random.default_rng(0)
    b, l, n = 4, 100, 61
    x = jnp.asarray(rng.standard_normal((b, l, n, n)).astype(np.float32)).astype(jnp.bfloat16)
    y = jnp.asarray(rng.standard_normal((b, n, n, 2)).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    grid = jnp.asarray(np.stack([gx, gy], 2).astype(np.float32)).astype(jnp.bfloat16)

    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)},
        x.astype(jnp.float32), grid.astype(jnp.float32))
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    def half(t):
        return jax.tree.map(lambda a: a.astype(jnp.bfloat16)
                            if a.dtype == jnp.float32 else a, t)

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, xb, yb, key):
        def loss_fn(p):
            out, updates = model.apply(
                {"params": half(p), "batch_stats": half(batch_stats)}, xb, grid,
                training=True, rngs={"sample": key}, mutable=["batch_stats"],
            )
            return jnp.mean((out.astype(jnp.float32) - yb) ** 2), updates["batch_stats"]

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), stats, opt_state, loss

    key = jax.random.PRNGKey(2)
    for _ in range(3):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y, k)
        # bf16 running stats come back from the mutable collection; keep feeding
        # them through (half() is then a no-op on them)
    jax.block_until_ready(loss)

    n_steps = int(os.environ.get("BLINDNO_BENCH_STEPS", "30"))
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(
            params, batch_stats, opt_state, x, y, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0
    out = {
        "metric": "2d_fpe_nio_train_steps_per_sec_bf16stored",
        "value": round(n_steps / dt, 3),
        "unit": "steps/s",
        "note": "secondary figure, accuracy NOT validated for bf16-stored mode; "
                "headline stays bench.py (f32-stored)",
    }
    with open("/root/repo/runs/logs/bench_bf16_r04.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
