"""Extended benchmarks (run when the TPU is idle): spectral impl comparison
(jnp truncated-DFT vs Pallas spectral-only vs fully-fused Pallas layer), TPU-hardware
parity of the Pallas kernels, and full 2D-NIO train-step timings per impl.

Writes runs/logs/bench_variants.json and prints one JSON line per measurement.
The default impl in blindno.ops.config is justified by this data (VERDICT r1 #6).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def measure(fn, *args, warmup=3, iters=20):
    import jax

    out = None
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

    # --- spectral conv op: jnp vs pallas vs fused layer, fwd, 2D FNO-head shape ---
    from blindno.ops.spectral import spectral_conv1d, spectral_conv2d
    from blindno.ops.spectral_pallas import spectral_conv2d_pallas
    from blindno.ops.fno_layer import fno1d_layer, fno2d_layer

    b, c, h, w, m = 16, 12, 76, 76, 32
    x = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((c, c, 2 * m, m)).astype(np.float32) * 0.01)
    wi = jnp.asarray(rng.standard_normal((c, c, 2 * m, m)).astype(np.float32) * 0.01)
    pk = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32) * 0.1)
    pb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32) * 0.1)

    def section(name, fn):
        """A compile failure in one kernel must not kill the other measurements."""
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — record, don't kill the TPU client
            results.append({"metric": name, "error": repr(e)[:400]})

    def sec_parity():
        # hardware parity first (the CPU tests only exercise interpret mode)
        ref_spec = spectral_conv2d(x, wr, wi)
        pal_spec = spectral_conv2d_pallas(x, wr, wi)
        err_spec = float(jnp.max(jnp.abs(ref_spec - pal_spec)) / (jnp.max(jnp.abs(ref_spec)) + 1e-30))
        ref_layer = jax.nn.gelu(ref_spec + jnp.einsum("io,bihw->bohw", pk, x) + pb.reshape(1, -1, 1, 1),
                                approximate=False)
        pal_layer = fno2d_layer(x, wr, wi, pk, pb, apply_act=True)
        err_layer = float(jnp.max(jnp.abs(ref_layer - pal_layer)) / (jnp.max(jnp.abs(ref_layer)) + 1e-30))
        results.append({"metric": "pallas_tpu_parity_rel_maxerr",
                        "spectral2d": err_spec, "fused_layer2d": err_layer,
                        "platform": jax.devices()[0].platform})

    f_jnp_layer = jax.jit(lambda x: jax.nn.gelu(
        spectral_conv2d(x, wr, wi) + jnp.einsum("io,bihw->bohw", pk, x) + pb.reshape(1, -1, 1, 1),
        approximate=False))

    def sec_spec2d():
        f_jnp = jax.jit(lambda x: spectral_conv2d(x, wr, wi))
        f_pal = jax.jit(lambda x: spectral_conv2d_pallas(x, wr, wi))
        t_jnp = measure(f_jnp, x)
        t_pal = measure(f_pal, x)
        results.append({"metric": "spectral2d_fwd_ms", "jnp": round(t_jnp * 1e3, 3),
                        "pallas": round(t_pal * 1e3, 3), "speedup": round(t_jnp / t_pal, 2)})

    def sec_layer2d():
        f_fused = jax.jit(lambda x: fno2d_layer(x, wr, wi, pk, pb))
        t_fused = measure(f_fused, x)
        t_jnp_layer = measure(f_jnp_layer, x)
        results.append({"metric": "fno2d_layer_fwd_ms", "jnp": round(t_jnp_layer * 1e3, 3),
                        "pallas_fused": round(t_fused * 1e3, 3),
                        "speedup": round(t_jnp_layer / t_fused, 2)})

    def sec_grad2d():
        # fused layer fwd+bwd (custom VJP) vs jnp autodiff
        g_fused = jax.jit(jax.grad(lambda x: (fno2d_layer(x, wr, wi, pk, pb) ** 2).mean()))
        g_jnp = jax.jit(jax.grad(lambda x: (f_jnp_layer(x) ** 2).mean()))
        t_gf = measure(g_fused, x)
        t_gj = measure(g_jnp, x)
        results.append({"metric": "fno2d_layer_grad_ms", "jnp": round(t_gj * 1e3, 3),
                        "pallas_fused": round(t_gf * 1e3, 3), "speedup": round(t_gj / t_gf, 2)})

    def sec_layer1d():
        # 1D layer at the fpe1d head shape
        b1, c1, n1, m1 = 32, 30, 100, 15
        x1 = jnp.asarray(rng.standard_normal((b1, c1, n1)).astype(np.float32))
        wr1 = jnp.asarray(rng.standard_normal((c1, c1, m1)).astype(np.float32) * 0.01)
        wi1 = jnp.asarray(rng.standard_normal((c1, c1, m1)).astype(np.float32) * 0.01)
        pk1 = jnp.asarray(rng.standard_normal((c1, c1)).astype(np.float32) * 0.1)
        pb1 = jnp.asarray(rng.standard_normal((c1,)).astype(np.float32) * 0.1)
        ref1 = jax.nn.gelu(
            spectral_conv1d(x1, wr1, wi1) + jnp.einsum("io,bin->bon", pk1, x1) + pb1.reshape(1, -1, 1),
            approximate=False)
        pal1 = fno1d_layer(x1, wr1, wi1, pk1, pb1)
        err1 = float(jnp.max(jnp.abs(ref1 - pal1)) / (jnp.max(jnp.abs(ref1)) + 1e-30))
        f1_jnp = jax.jit(lambda x: jax.nn.gelu(
            spectral_conv1d(x, wr1, wi1) + jnp.einsum("io,bin->bon", pk1, x) + pb1.reshape(1, -1, 1),
            approximate=False))
        f1_fused = jax.jit(lambda x: fno1d_layer(x, wr1, wi1, pk1, pb1))
        t1j = measure(f1_jnp, x1)
        t1f = measure(f1_fused, x1)
        results.append({"metric": "fno1d_layer_fwd_ms", "jnp": round(t1j * 1e3, 3),
                        "pallas_fused": round(t1f * 1e3, 3), "speedup": round(t1j / t1f, 2),
                        "parity_rel_maxerr": err1})

    section("pallas_tpu_parity_rel_maxerr", sec_parity)
    section("spectral2d_fwd_ms", sec_spec2d)
    section("fno2d_layer_fwd_ms", sec_layer2d)
    section("fno2d_layer_grad_ms", sec_grad2d)
    section("fno1d_layer_fwd_ms", sec_layer1d)

    # --- full 2D NIO train step per impl ---
    def build_step():
        model = NIOFP2D(width=12, modes=32, n_basis=25, neurons=100, fno_layers=3)
        xb = jnp.asarray(rng.standard_normal((16, 100, 61, 61)).astype(np.float32))
        yb = jnp.asarray(rng.standard_normal((16, 61, 61, 2)).astype(np.float32))
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

    for impl in ("jnp", "pallas_fused"):
        set_spectral_impl(impl)
        try:
            step = build_step()
            t = measure(step, jax.random.PRNGKey(3), warmup=3, iters=20)
            results.append({"metric": f"nio2d_train_step_ms_{impl}", "value": round(t * 1e3, 2),
                            "steps_per_sec": round(1.0 / t, 2)})
        except Exception as e:  # noqa: BLE001 — record, don't kill the TPU client
            results.append({"metric": f"nio2d_train_step_ms_{impl}", "error": repr(e)[:300]})
    set_spectral_impl("jnp")

    for r in results:
        print(json.dumps(r), flush=True)
    os.makedirs("/root/repo/runs/logs", exist_ok=True)
    with open("/root/repo/runs/logs/bench_variants.json", "w") as fh:
        json.dump(results, fh, indent=1)


if __name__ == "__main__":
    main()
