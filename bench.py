"""Headline benchmark: 2D FPE NIO training-step throughput on TPU.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Config matches the reference's benchmarked setup (``2d_FPE/train_nio.py``): NIOFP2D
(width 12, modes 32, n_basis 25, 3 FNO layers), batch 4, L=100 snapshots on a 61x61
grid, Adam. The measured quantity is full training steps/sec (forward + backward +
optimizer update) on one chip.

Baseline: the reference publishes no throughput numbers (BASELINE.md). ``A100_EST``
is an engineering estimate of the PyTorch reference's A100 step rate derived from its
per-step work (Encoder2D over 400 61x61 snapshots with up to 512 channels + 2x FNO2d
rfft2/einsum/irfft2 at width 12, modes 32 + DDP overhead; measured torch-CPU step time
scaled by a typical A100/CPU factor for this op mix). vs_baseline = ours / estimate.
"""
import json
import time

import numpy as np

A100_EST_STEPS_PER_SEC = 12.0


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

    n_steps = 30
    t0 = time.perf_counter()
    for i in range(n_steps):
        key, k = jax.random.split(key)
        params, batch_stats, opt_state, loss = train_step(params, batch_stats, opt_state, x, y, k)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    sps = n_steps / dt
    print(json.dumps({
        "metric": "2d_fpe_nio_train_steps_per_sec",
        "value": round(sps, 3),
        "unit": "steps/s",
        "vs_baseline": round(sps / A100_EST_STEPS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
