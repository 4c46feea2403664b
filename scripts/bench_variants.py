"""Extended benchmarks (run when the TPU is idle): spectral impl comparison
(jnp truncated-DFT vs fused Pallas), batch scaling, and per-model step timings.

Prints one JSON line per measurement.
"""
import json
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def measure(fn, *args, warmup=3, iters=20):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from blindno.ops.config import set_spectral_impl
    from blindno.models.nio2d import NIOFP2D

    rng = np.random.default_rng(0)
    results = []

    # --- spectral conv op: jnp vs pallas, fwd + grad, 2D FNO-head shape ---
    from blindno.ops.spectral import spectral_conv2d
    from blindno.ops.spectral_pallas import spectral_conv2d_pallas

    b, c, h, w, m = 4, 12, 76, 76, 32
    x = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((c, c, 2 * m, m)).astype(np.float32) * 0.01)
    wi = jnp.asarray(rng.standard_normal((c, c, 2 * m, m)).astype(np.float32) * 0.01)
    f_jnp = jax.jit(lambda x: spectral_conv2d(x, wr, wi))
    f_pal = jax.jit(lambda x: spectral_conv2d_pallas(x, wr, wi))
    t_jnp = measure(f_jnp, x)
    t_pal = measure(f_pal, x)
    results.append({"metric": "spectral2d_fwd_ms", "jnp": round(t_jnp * 1e3, 3),
                    "pallas": round(t_pal * 1e3, 3), "speedup": round(t_jnp / t_pal, 2)})

    g_jnp = jax.jit(jax.grad(lambda x: spectral_conv2d(x, wr, wi).sum()))
    t_gjnp = measure(g_jnp, x)
    results.append({"metric": "spectral2d_grad_ms", "jnp": round(t_gjnp * 1e3, 3)})

    # --- full 2D NIO train step: jnp vs pallas spectral ---
    def build_step():
        model = NIOFP2D(width=12, modes=32, n_basis=25, neurons=100, fno_layers=3)
        xb = jnp.asarray(rng.standard_normal((4, 100, 61, 61)).astype(np.float32))
        yb = jnp.asarray(rng.standard_normal((4, 61, 61, 2)).astype(np.float32))
        gx, gy = np.meshgrid(np.linspace(-1, 1, 61), np.linspace(-1, 1, 61), indexing="ij")
        grid = jnp.asarray(np.stack([gx, gy], 2).astype(np.float32))
        variables = jax.jit(model.init)(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, xb, grid)
        params = variables["params"]
        bs = variables.get("batch_stats", {})
        tx = optax.adam(5e-4)
        opt = tx.init(params)

        @jax.jit
        def step(params, bs, opt, k):
            def loss_fn(p):
                out, up = model.apply({"params": p, "batch_stats": bs}, xb, grid, training=True,
                                      rngs={"sample": k}, mutable=["batch_stats"])
                return jnp.mean((out - yb) ** 2), up["batch_stats"]

            (l, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
            u, opt2 = tx.update(g, opt, params)
            return optax.apply_updates(params, u), nbs, opt2, l

        return lambda k: step(params, bs, opt, k)

    for impl in ("jnp", "pallas"):
        set_spectral_impl(impl)
        step = build_step()
        t = measure(step, jax.random.PRNGKey(3), warmup=3, iters=20)
        results.append({"metric": f"nio2d_train_step_ms_{impl}", "value": round(t * 1e3, 2),
                        "steps_per_sec": round(1.0 / t, 2)})
    set_spectral_impl("jnp")

    for r in results:
        print(json.dumps(r))


if __name__ == "__main__":
    main()
