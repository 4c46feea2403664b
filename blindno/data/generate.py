"""On-device dataset generation for all four suites.

Re-design of the reference's data generators (L0 call stacks, SURVEY.md §3.1):
parameter sampling happens on the host (numpy RNG, including the rejection sampling of
well centers), while all PDE solves run on-device, vmapped over the sample batch.
Archives keep the reference's exact npz/npy keys so the two data formats are
interchangeable:
- FPE suites:  ``time, grid, trajectories, potential, drag`` (+ ``F`` for the NC suite)
  (``1d_FPE/dataset_1d_drift_diffusion.py:91-98``, ``2d_FPE/test_datagen.py:89-97``,
  ``2d_Non_conservative_FPE/testdata_gen.py``).
- GPE suites:  dict npy ``{y, g, kappa, V}`` (``1d_GPE/datagen_schrodinger.py:183-189``).
"""
from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from blindno.solvers.fokker_planck import KB, grid_from_extent, propagate_eigh, propagate_expm
from blindno.solvers import gpe as gpe_solver

NM = 1e-9
VISCOSITY = 8e-4
RADIUS = 50 * NM
BASE_DRAG = 6 * np.pi * VISCOSITY * RADIUS
TEMPERATURE = 300.0
BETA = 1.0 / (KB * TEMPERATURE)


# ------------------------------------------------------------------ 1D FPE

def _sample_wells_1d(rng, n_wells=3, lo=-150 * NM, hi=150 * NM, min_dist=80 * NM):
    """Rejection-sample well centers >= min_dist apart (``dataset_1d_drift_diffusion.py:18-31``)."""
    while True:
        centers = rng.uniform(lo, hi, size=n_wells)
        if all(
            abs(centers[i] - centers[j]) > min_dist
            for i in range(n_wells)
            for j in range(i + 1, n_wells)
        ):
            return centers


def sample_fpe1d_params(rng, m):
    centers = np.stack([_sample_wells_1d(rng) for _ in range(m)])  # (M, 3)
    widths = rng.uniform(20 * NM, 80 * NM, size=(m, 3))
    amps = rng.uniform(1e-20, 2e-20, size=(m, 3))
    visc = rng.uniform(1.0, 2.0, size=(m, 1))
    return centers, widths, amps * visc, BASE_DRAG * visc[:, 0]


def _wells_on_grid(x, centers, widths, amps):
    """U(x) = -sum_i A_i exp(-((x - c_i)/w_i)^2), batched: (M, 3) params -> (M, Nx)."""
    d = (x[None, None, :] - centers[:, :, None]) / widths[:, :, None]
    return -(amps[:, :, None] * np.exp(-(d**2))).sum(axis=1)


def generate_fpe1d(seed: int, m: int, n_snapshots: int = 100, tf: float = 2e-3,
                   nsteps: int = 400, resolution: float = 10 * NM, extent: float = 800 * NM,
                   init_width: float = 50 * NM, batch: int = 64, store_pt: bool = False):
    """1-D FPE drift-diffusion dataset (``dataset_1d_drift_diffusion.py``).

    TPU path: one dense ``expm`` of the per-step propagator + a matvec scan over the
    fplanck-style uniform output grid (eigh is QR-iteration-bound on TPU and loses to
    the pure-matmul expm even at 80x80), then an on-device gather of the per-sample
    random snapshot indices. Returns the reference's npz dict.

    ``store_pt=True`` additionally stores the FULL density trajectory over all
    ``nsteps`` recorded times as ``Pt`` (M, nsteps, Nx) plus ``time_full`` — the
    reference's evaluation-archive format (``1d_FPE/dataset_gen_evaluation.py``
    keeps Pt so compute_time_error can integrate without re-solving). The default
    keeps only the sampled snapshots (our time_error re-solves ground truth
    on-device instead — an equivalent metric at a fraction of the archive size).
    """
    rng = np.random.default_rng(seed)
    x = np.asarray(grid_from_extent(extent, resolution)[0])
    centers, widths, amps, drags = sample_fpe1d_params(rng, m)
    u = _wells_on_grid(x, centers, widths, amps)  # (M, Nx)
    full_time = np.linspace(0.0, tf, nsteps)
    sel = np.stack([
        np.sort(rng.choice(nsteps, size=n_snapshots, replace=False)) for _ in range(m)
    ])  # (M, n_snapshots)
    times = full_time[sel]

    p0 = np.exp(-((x / init_width) ** 2))
    p0 = p0 / p0.sum()
    diff = KB * TEMPERATURE / drags  # (M,)

    def solve(u_i, d_i, sel_i):
        pt = propagate_expm(u_i, d_i * jnp.ones_like(u_i), resolution, BETA,
                            jnp.asarray(p0, u_i.dtype), jnp.asarray(full_time, u_i.dtype))
        return (pt, jnp.take(pt, sel_i, axis=0)) if store_pt else jnp.take(pt, sel_i, axis=0)

    solve_v = jax.jit(jax.vmap(solve))
    trajs, fulls = [], []
    for s in range(0, m, batch):
        e = min(s + batch, m)
        out = solve_v(jnp.asarray(u[s:e], jnp.float32), jnp.asarray(diff[s:e], jnp.float32),
                      jnp.asarray(sel[s:e]))
        if store_pt:
            fulls.append(np.asarray(out[0]))
            out = out[1]
        trajs.append(np.asarray(out))
    trajectories = np.concatenate(trajs)  # (M, n_snapshots, Nx)
    d = {
        "time": times,
        "grid": np.broadcast_to(x, (m, x.shape[0])).copy(),
        "trajectories": trajectories,
        "potential": u,
        "drag": drags,
    }
    if store_pt:
        d["Pt"] = np.concatenate(fulls)  # (M, nsteps, Nx) full recorded trajectory
        d["time_full"] = np.broadcast_to(full_time, (m, nsteps)).copy()
    return d


# ------------------------------------------------------------------ 2D FPE

def sample_fpe2d_params(rng, m):
    centers = []
    for _ in range(m):
        while True:
            c = rng.uniform(-100 * NM, 100 * NM, size=(3, 2))
            dist = np.sqrt(((c[:, None] - c[None, :]) ** 2).sum(-1))
            if np.all(dist[np.triu_indices(3, k=1)] > 90 * NM):
                break
        centers.append(c)
    centers = np.stack(centers)  # (M, 3, 2)
    widths = rng.uniform(20 * NM, 80 * NM, size=(m, 3))
    amps = rng.uniform(1e-20, 2e-20, size=(m, 3))
    visc = rng.uniform(0.0, 2.0, size=(m,))
    diff_centers = rng.uniform(-100 * NM, 100 * NM, size=(m, 2))
    return centers, widths, amps, visc, diff_centers


def generate_fpe2d(seed: int, m: int, n_snapshots: int = 100, tf: float = 2e-4,
                   nsteps: int = 1000, resolution: float = 10 * NM,
                   extent=(600 * NM, 600 * NM), init_width: float = 50 * NM, batch: int = 8):
    """2-D FPE with space-varying drag (``2d_FPE/test_datagen.py``)."""
    rng = np.random.default_rng(seed)
    axes = [np.asarray(a) for a in grid_from_extent(extent, resolution)]
    gx, gy = np.meshgrid(axes[0], axes[1], indexing="ij")
    centers, widths, amps, visc, diff_centers = sample_fpe2d_params(rng, m)

    # U: (M, Nx, Ny)
    d2 = ((gx[None, None] - centers[:, :, 0, None, None]) ** 2
          + (gy[None, None] - centers[:, :, 1, None, None]) ** 2)
    u = -(amps[:, :, None, None] * np.exp(-d2 / widths[:, :, None, None] ** 2)).sum(axis=1)
    # gamma(x, y) = drag * (1 + vf * xs^2 + vf * ys^2), xs = (x - dcx)/250nm
    xs = (gx[None] - diff_centers[:, 0, None, None]) / (250 * NM)
    ys = (gy[None] - diff_centers[:, 1, None, None]) / (250 * NM)
    gamma = BASE_DRAG * (1.0 + visc[:, None, None] * xs**2 + visc[:, None, None] * ys**2)
    diff = KB * TEMPERATURE / gamma  # (M, Nx, Ny)

    full_time = np.linspace(0.0, tf, nsteps)
    sel = np.stack([
        np.sort(rng.choice(nsteps, size=n_snapshots, replace=False)) for _ in range(m)
    ])
    times = full_time[sel]

    p0 = np.exp(-((gx / init_width) ** 2) - ((gy / init_width) ** 2))
    p0 = (p0 / p0.sum()).ravel()

    # TPU note: batched eigh at 3721^2 is QR-iteration bound and far slower than the
    # matmul-only expm + matvec-scan path, which also matches the fplanck output grid
    # (uniform linspace times) exactly. Snapshots are gathered on-device per sample.
    def solve(u_i, d_i, sel_i):
        pt = propagate_expm(u_i, d_i, resolution, BETA, jnp.asarray(p0, u_i.dtype),
                            jnp.asarray(full_time, u_i.dtype))
        return jnp.take(pt, sel_i, axis=0).reshape(sel_i.shape[0], *u_i.shape)

    solve_v = jax.jit(jax.vmap(solve))
    trajs = []
    for s in range(0, m, batch):
        e = min(s + batch, m)
        out = solve_v(jnp.asarray(u[s:e], jnp.float32), jnp.asarray(diff[s:e], jnp.float32),
                      jnp.asarray(sel[s:e]))
        trajs.append(np.asarray(out))
    trajectories = np.concatenate(trajs)
    grid = np.stack([gx, gy])  # (2, Nx, Ny)
    return {
        "time": times,
        "grid": np.broadcast_to(grid, (m,) + grid.shape).copy(),
        "trajectories": trajectories,
        "potential": u,
        "drag": gamma,
    }


# ------------------------------------------------------------------ 2D non-conservative FPE

def sample_ncfpe2d_params(rng, m):
    return {
        "L": rng.uniform(50 * NM, 150 * NM, size=m),
        "a": rng.uniform(0.5, 2.0, size=m),
        "b": rng.uniform(0.5, 2.0, size=m),
        "c": rng.uniform(0.5, 2.0, size=m),
        "d": rng.uniform(0.5, 2.0, size=m),
    }


def _spiral_on_grid(gx, gy, p):
    """(M,) params -> F (M, 2, Nx, Ny) (``2d_Non_conservative_FPE/testdata_gen.py:18-25``)."""
    rad = np.sqrt(gx**2 + gy**2)[None]
    phi = np.arctan2(gy, gx)[None]
    L = p["L"][:, None, None]
    f_phi = 1e-12 * rad / L * np.exp(-rad / L * p["b"][:, None, None]) * p["a"][:, None, None]
    f_rad = 1e-12 * (1 - rad / L) * np.exp(-rad / L * p["d"][:, None, None]) * p["c"][:, None, None]
    fx = -np.sin(phi) * f_phi + np.cos(phi) * f_rad
    fy = np.cos(phi) * f_phi + np.sin(phi) * f_rad
    return np.stack([fx, fy], axis=1)


def generate_ncfpe2d(seed: int, m: int, n_snapshots: int = 100, tf: float = 10e-3,
                     nsteps: int = 500, resolution: float = 10 * NM,
                     extent=(800 * NM, 800 * NM), init_center=(-150 * NM, -150 * NM),
                     init_width: float = 30 * NM, batch: int = 2):
    """2-D FPE driven by a non-conservative spiral force (``testdata_gen.py``).

    batch=2: expm's LU block on the 6400^2 generator is f32[b,6400,128] in scoped
    VMEM; b=4 exceeds the 16 MB limit on v5e (observed compile failure), b=2 fits."""
    rng = np.random.default_rng(seed)
    axes = [np.asarray(a) for a in grid_from_extent(extent, resolution)]
    gx, gy = np.meshgrid(axes[0], axes[1], indexing="ij")
    params = sample_ncfpe2d_params(rng, m)
    f = _spiral_on_grid(gx, gy, params)  # (M, 2, Nx, Ny)
    u = np.zeros((m,) + gx.shape)
    diff = KB * TEMPERATURE / BASE_DRAG

    full_time = np.linspace(0.0, tf, nsteps)
    sel = np.stack([
        np.sort(rng.choice(nsteps, size=n_snapshots, replace=False)) for _ in range(m)
    ])
    times = full_time[sel]

    p0 = np.exp(-(((gx - init_center[0]) / init_width) ** 2) - (((gy - init_center[1]) / init_width) ** 2))
    p0 = (p0 / p0.sum()).ravel()

    def solve(u_i, f_i, sel_i):
        pt = propagate_expm(u_i, diff, resolution, BETA, jnp.asarray(p0, u_i.dtype),
                            jnp.asarray(full_time, u_i.dtype), force=f_i)
        return jnp.take(pt, sel_i, axis=0).reshape(sel_i.shape[0], *u_i.shape)

    solve_v = jax.jit(jax.vmap(solve))
    trajs = []
    for s in range(0, m, batch):
        e = min(s + batch, m)
        out = np.asarray(
            solve_v(jnp.asarray(u[s:e], jnp.float32), jnp.asarray(f[s:e], jnp.float32),
                    jnp.asarray(sel[s:e])))
        # the non-conservative propagator is built by a truncated matmul series; check
        # mass conservation per batch so a solver regression aborts the run in seconds
        # instead of after hours of generation (the path had two such bugs in round 2)
        mass_dev = np.abs(out.sum(axis=(2, 3)) - 1.0).max()
        if mass_dev > 1e-2:
            raise RuntimeError(
                f"NC datagen mass drift {mass_dev:.3e} (> 1e-2) in samples "
                f"[{s}:{e}); solver regression")
        trajs.append(out)
    trajectories = np.concatenate(trajs)
    grid = np.stack([gx, gy])
    return {
        "time": times,
        "grid": np.broadcast_to(grid, (m,) + grid.shape).copy(),
        "trajectories": trajectories,
        "F": f,
    }


# ------------------------------------------------------------------ 1D GPE / Schrodinger

def generate_gpe1d(seed: int, num_orbits: int, g: float, kappa: float, nx: int = 128,
                   dt: float = 0.005, t_final: float = 5.0, stride: int = 10,
                   batch: int = 256):
    """Schrodinger (g=kappa=0) / GPE (g=kappa=2) orbit dataset
    (``1d_GPE/datagen_schrodinger.py:120-191``, ``datagen_GPE.py``).

    Snapshots follow the reference's actual behavior: a uniform stride-10 subsample of
    the |psi| record (the drawn random indices are ignored, ``:163-165``), giving
    ``Nt//stride + 1`` = 101 snapshots per orbit.
    """
    rng = np.random.default_rng(seed)
    x = np.linspace(-10.0, 10.0, nx)
    nt = int(t_final / dt) + 1
    a = rng.uniform(0.1, 0.3, size=num_orbits)
    b = rng.uniform(0.5, 2.0, size=num_orbits)
    c = rng.uniform(0.5, 2.0, size=num_orbits)
    x0 = rng.uniform(-3.0, 3.0, size=num_orbits)
    v = (a[:, None] * (x[None] - x0[:, None]) ** 2
         + b[:, None] * np.cos(c[:, None] * (x[None] - x0[:, None])) ** 2)

    psi0 = np.asarray(gpe_solver.get_initial_condition(2, jnp.asarray(x)))
    xj = jnp.asarray(x, jnp.float32)

    def solve(v_i):
        rec = gpe_solver.solve_gpe(jnp.asarray(psi0, jnp.complex64), xj, dt, nt,
                                   g, kappa, v_i)
        return jnp.abs(rec[::stride])

    solve_v = jax.jit(jax.vmap(solve))
    ys = []
    for s in range(0, num_orbits, batch):
        e = min(s + batch, num_orbits)
        ys.append(np.asarray(solve_v(jnp.asarray(v[s:e], jnp.float32))))
    y = np.concatenate(ys)  # (M, nt//stride + 1, Nx)
    return {
        "y": y,
        "g": np.full(num_orbits, float(g)),
        "kappa": np.full(num_orbits, float(kappa)),
        "V": v,
    }
