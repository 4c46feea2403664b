"""Where does the 2D FPE NIO train step spend its time? (VERDICT r3 Missing #5)

Component-level timing + XLA cost analysis of the benchmarked step (bench.py config:
NIOFP2D width 12, modes 32, n_basis 25, bs 4, L=100, 61x61 — the reference step
``2d_FPE/train_nio.py:83-143``). Writes ONE JSON summary to
``runs/logs/profile_r04.json`` and a raw ``jax.profiler`` trace (20 steps) under
``runs/profile/r04`` (not committed; the JSON is the committed artifact).

Components are timed as standalone jitted programs with the exact shapes the full
step uses, training-mode batch norm included, so fwd+bwd component times sum to
approximately the full step (the residue = fusion/optimizer/overhead).
"""
import json
import os
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import numpy as np

OUT = "/root/repo/runs/logs/profile_r04.json"
TRACE_DIR = "/root/repo/runs/profile/r04"


def _timed(fn, *args, n=30, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3  # ms


def _cost(fn, *args):
    try:
        c = fn.lower(*args).compile().cost_analysis()
        return {"flops": float(c.get("flops", float("nan"))),
                "bytes": float(c.get("bytes accessed", float("nan")))}
    except Exception as e:  # noqa: BLE001 — cost analysis is best-effort
        return {"error": str(e)}


def main():
    import jax
    import jax.numpy as jnp
    import optax

    from blindno.models.nio2d import NIOFP2D
    from blindno.nn.cnn import Encoder2D
    from blindno.nn.deeponet import FFN
    from blindno.nn.fno import FNO2d

    rng = np.random.default_rng(0)
    b, l, n, width, n_basis = 4, 100, 61, 12, 25
    x = jnp.asarray(rng.standard_normal((b, l, n, n)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, n, n, 2)).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    grid = jnp.asarray(np.stack([gx, gy], 2).astype(np.float32))
    report = {"platform": jax.devices()[0].platform,
              "device": str(jax.devices()[0].device_kind),
              "config": {"b": b, "l": l, "n": n, "width": width}}

    def bench_module(name, module, *args, training_kw=True):
        """Time fwd and fwd+bwd (grad wrt params) of one flax module."""
        kw = {"training": True} if training_kw else {}
        variables = jax.jit(partial(module.init, **kw))(
            {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, *args)
        params = variables["params"]
        stats = variables.get("batch_stats", {})

        @jax.jit
        def fwd(p, s, *a):
            out, _ = module.apply({"params": p, "batch_stats": s}, *a, **kw,
                                  mutable=["batch_stats"])
            return out

        @jax.jit
        def fwdbwd(p, s, *a):
            def loss(pp):
                out, upd = module.apply({"params": pp, "batch_stats": s}, *a, **kw,
                                        mutable=["batch_stats"])
                return jnp.mean(out ** 2)

            return jax.value_and_grad(loss)(p)

        try:
            report[name] = {
                "fwd_ms": round(_timed(fwd, params, stats, *args), 3),
                "fwdbwd_ms": round(_timed(fwdbwd, params, stats, *args), 3),
                "cost_fwdbwd": _cost(fwdbwd, params, stats, *args),
            }
        except Exception as e:  # noqa: BLE001
            report[name] = {"error": str(e)}

    # --- components at the exact step shapes -------------------------------
    bench_module("encoder2d_BL400", Encoder2D(n_basis, (2, 1)),
                 x)  # (B, L, H, W) -> (B, L, 25)
    bench_module("ffn_trunk_3721", FFN(2, n_basis, 3, 100), grid.reshape(-1, 2))
    fused = jnp.asarray(rng.standard_normal((b, n, n, width)).astype(np.float32))
    bench_module("fno2d_head_single", FNO2d(32, width, 3, width, 1), fused,
                 training_kw=False)

    # --- full train step (bench.py replica) --------------------------------
    model = NIOFP2D(width=width, modes=32, n_basis=n_basis, neurons=100, fno_layers=3)
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, grid)
    params, stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adam(5e-4)
    opt_state = tx.init(params)

    @jax.jit
    def full_fwd(p, s, key):
        out, _ = model.apply({"params": p, "batch_stats": s}, x, grid, training=True,
                             rngs={"sample": key}, mutable=["batch_stats"])
        return out

    @jax.jit
    def full_fwdbwd(p, s, key):
        def loss(pp):
            out, upd = model.apply({"params": pp, "batch_stats": s}, x, grid,
                                   training=True, rngs={"sample": key},
                                   mutable=["batch_stats"])
            return jnp.mean((out - y) ** 2)

        return jax.value_and_grad(loss)(p)

    @jax.jit
    def full_step(p, s, o, key):
        def loss(pp):
            out, upd = model.apply({"params": pp, "batch_stats": s}, x, grid,
                                   training=True, rngs={"sample": key},
                                   mutable=["batch_stats"])
            return jnp.mean((out - y) ** 2), upd["batch_stats"]

        (lv, new_s), grads = jax.value_and_grad(loss, has_aux=True)(p)
        updates, o = tx.update(grads, o, p)
        return optax.apply_updates(p, updates), new_s, o, lv

    key = jax.random.PRNGKey(2)
    report["full_fwd_ms"] = round(_timed(full_fwd, params, stats, key), 3)
    report["full_fwdbwd_ms"] = round(_timed(full_fwdbwd, params, stats, key), 3)
    report["full_step_ms"] = round(_timed(full_step, params, stats, opt_state, key), 3)
    report["full_step_cost"] = _cost(full_step, params, stats, opt_state, key)
    report["steps_per_sec"] = round(1e3 / report["full_step_ms"], 2)

    # --- raw profiler trace of 20 steady-state steps ------------------------
    try:
        os.makedirs(TRACE_DIR, exist_ok=True)
        jax.profiler.start_trace(TRACE_DIR)
        o, p, s = opt_state, params, stats
        for _ in range(20):
            p, s, o, lv = full_step(p, s, o, key)
        jax.block_until_ready(lv)
        jax.profiler.stop_trace()
        report["trace_dir"] = TRACE_DIR
    except Exception as e:  # noqa: BLE001
        report["trace_error"] = str(e)

    os.makedirs(os.path.dirname(OUT), exist_ok=True)
    with open(OUT, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
