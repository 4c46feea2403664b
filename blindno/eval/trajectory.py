"""Density-trajectory rollouts from saved/predicted coefficients (figure data).

Re-design of the reference's ``cal_traj*.py`` one-off scripts
(``1d_FPE/cal_trajectory.py:52-126``, ``2d_FPE/cal_traj.py``, ``1d_GPE/cal_trajectory*.py``):
given predicted (or ground-truth) coefficient fields, roll out the density/wavefunction
trajectory on the reference's rollout grids and return/save ``Pt``.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from blindno.data.generate import BASE_DRAG, BETA, KB, NM, TEMPERATURE
from blindno.solvers.fokker_planck import grid_from_extent, propagate_expm
from blindno.solvers import gpe as gpe_solver


def fpe1d_trajectory(u, drag, *, tf: float = 2e-3, nsteps: int = 400,
                     extent: float = 800 * NM, resolution: float = 10 * NM,
                     init_center: float = 0.0, init_width: float = 50 * NM):
    """(time (Nt,), Pt (Nt, Nx)) for one potential/drag pair
    (``1d_FPE/cal_trajectory.py``: Gaussian init at 0, width 50nm)."""
    x = np.asarray(grid_from_extent(extent, resolution)[0])
    p0 = np.exp(-(((x - init_center) / init_width) ** 2))
    p0 = (p0 / p0.sum()).astype(np.float32)
    times = jnp.linspace(0.0, tf, nsteps)
    ones = jnp.ones_like(jnp.asarray(u, jnp.float32))
    pt = propagate_expm(jnp.asarray(u, jnp.float32), KB * TEMPERATURE / drag * ones,
                        resolution, BETA, jnp.asarray(p0), times)
    return np.asarray(times), np.asarray(pt)


def fpe2d_trajectory(u, gamma, *, tf: float = 2e-4, nsteps: int = 1000,
                     extent=(600 * NM, 600 * NM), resolution: float = 10 * NM,
                     init_center=(0.0, 0.0), init_width: float = 50 * NM,
                     clamp_potential: bool = True):
    """2-D rollout (``2d_FPE/cal_traj.py``; ``clamp_potential`` reproduces its
    ``U[U >= 0] = 0`` pre-rollout clamp at ``:131``)."""
    axes = [np.asarray(a) for a in grid_from_extent(extent, resolution)]
    gx, gy = np.meshgrid(axes[0], axes[1], indexing="ij")
    u = np.asarray(u, np.float32).copy()
    if clamp_potential:
        u[u >= 0] = 0.0
    p0 = np.exp(-(((gx - init_center[0]) / init_width) ** 2) - (((gy - init_center[1]) / init_width) ** 2))
    p0 = (p0 / p0.sum()).ravel().astype(np.float32)
    times = jnp.linspace(0.0, tf, nsteps)
    pt = propagate_expm(jnp.asarray(u), KB * TEMPERATURE / jnp.asarray(gamma, jnp.float32),
                        resolution, BETA, jnp.asarray(p0), times)
    return np.asarray(times), np.asarray(pt).reshape(nsteps, *gx.shape)


def ncfpe2d_trajectory(f, *, tf: float = 10e-3, nsteps: int = 500,
                       extent=(800 * NM, 800 * NM), resolution: float = 10 * NM,
                       init_center=(-150 * NM, -150 * NM), init_width: float = 30 * NM):
    """Force-driven rollout (``2d_Non_conservative_FPE/cal_traj.py``)."""
    axes = [np.asarray(a) for a in grid_from_extent(extent, resolution)]
    gx, gy = np.meshgrid(axes[0], axes[1], indexing="ij")
    p0 = np.exp(-(((gx - init_center[0]) / init_width) ** 2) - (((gy - init_center[1]) / init_width) ** 2))
    p0 = (p0 / p0.sum()).ravel().astype(np.float32)
    times = jnp.linspace(0.0, tf, nsteps)
    zero_u = jnp.zeros(gx.shape, jnp.float32)
    pt = propagate_expm(zero_u, KB * TEMPERATURE / BASE_DRAG, resolution, BETA,
                        jnp.asarray(p0), times, force=jnp.asarray(f, jnp.float32))
    return np.asarray(times), np.asarray(pt).reshape(nsteps, *gx.shape)


def gpe_trajectory(v, g: float, kappa: float, *, nx: int = 128, dt: float = 0.005,
                   t_final: float = 5.0, ic: int = 2):
    """(time, |psi| (Nt, Nx)) (``1d_GPE/cal_trajectory_GPE.py``)."""
    x = jnp.linspace(-10.0, 10.0, nx)
    nt = int(round(t_final / dt)) + 1
    psi0 = gpe_solver.get_initial_condition(ic, x)
    rec = gpe_solver.solve_gpe(psi0, x, dt, nt, g, kappa, jnp.asarray(v, jnp.float32))
    return np.linspace(0.0, t_final, nt), np.abs(np.asarray(rec))
