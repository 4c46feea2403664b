"""Potential / force / pdf constructors for the Fokker-Planck solver suites.

JAX-native re-implementations of the (uninstalled) ``fplanck`` helpers the reference
uses for data generation (usage surface: ``/root/reference/1d_FPE/dataset_1d_drift_diffusion.py:3,45-62``,
``2d_FPE/test_datagen.py:19-43``, ``2d_Non_conservative_FPE/testdata_gen.py:18-25``).
Everything is a plain function of grid coordinate arrays; ``combine`` sums callables.

The width / sign / normalization conventions assumed here (1/e half-width, attractive
wells for positive amplitude, solver-side mass normalization) are derived and
risk-bounded in ``docs/fplanck_conventions.md`` — fplanck itself cannot be installed
in this environment, so that note is the convention contract.
"""
from __future__ import annotations

import jax.numpy as jnp

__all__ = [
    "gaussian_potential",
    "gaussian_pdf",
    "combine",
    "potential_from_data",
    "uniform_pdf",
    "harmonic_potential",
    "spiral_force",
    "quadratic_cos2_potential",
]


def gaussian_potential(center, width, amplitude):
    """Gaussian potential well ``U(x) = -A * prod_i exp(-((x_i - c_i)/w_i)^2)``.

    Attractive for A > 0 (matches the reference's wells: amplitudes ~1-2e-20 J and
    2-D eval figures clamping U >= 0 to zero, ``2d_FPE/cal_traj.py:131``).
    """
    center = jnp.atleast_1d(jnp.asarray(center) * 1.0)
    width = jnp.broadcast_to(jnp.atleast_1d(jnp.asarray(width)), center.shape)

    def u(*coords):
        val = 1.0
        for i, c in enumerate(coords):
            val = val * jnp.exp(-(((c - center[i]) / width[i]) ** 2))
        return -amplitude * val

    return u


def gaussian_pdf(center, width):
    """Unnormalized Gaussian density ``exp(-sum_i ((x_i - c_i)/w)^2)``; the solver
    normalizes initial conditions to unit total mass."""
    center = jnp.atleast_1d(jnp.asarray(center) * 1.0)

    def p(*coords):
        val = 1.0
        for i, c in enumerate(coords):
            val = val * jnp.exp(-(((c - center[i]) / width) ** 2))
        return val

    return p


def uniform_pdf():
    def p(*coords):
        return jnp.ones_like(coords[0])

    return p


def harmonic_potential(k):
    def u(*coords):
        val = 0.0
        for c in coords:
            val = val + 0.5 * k * c**2
        return val

    return u


def combine(*funcs):
    """Sum of potential callables (``fplanck.combine``)."""

    def u(*coords):
        total = funcs[0](*coords)
        for f in funcs[1:]:
            total = total + f(*coords)
        return total

    return u


def potential_from_data(grid, data):
    """Linear interpolation of tabulated potential values, matching the reference's
    local RegularGridInterpolator replacement (``2d_FPE/cal_traj.py:9-81``).

    grid: (Nx,) or tuple/stack of axis coordinate arrays; data: field on that grid.
    Returns a callable usable as ``potential=`` for :class:`FokkerPlanck`.
    """
    data = jnp.asarray(data)
    if data.ndim == 1:
        axis = jnp.asarray(grid[0] if isinstance(grid, (tuple, list)) or jnp.ndim(grid) == 2 else grid).reshape(-1)

        def u(*coords):
            return jnp.interp(coords[0], axis, data)

        return u
    if data.ndim == 2:
        gx = jnp.asarray(grid[0])
        gy = jnp.asarray(grid[1])
        # axis coordinate vectors from (possibly meshgrid'ed) inputs
        ax = gx[:, 0] if gx.ndim == 2 else gx.reshape(-1)
        ay = gy[0, :] if gy.ndim == 2 else gy.reshape(-1)

        def u(x, y):
            ix = jnp.clip(jnp.searchsorted(ax, x, side="right") - 1, 0, ax.shape[0] - 2)
            iy = jnp.clip(jnp.searchsorted(ay, y, side="right") - 1, 0, ay.shape[0] - 2)
            tx = (x - ax[ix]) / (ax[ix + 1] - ax[ix])
            ty = (y - ay[iy]) / (ay[iy + 1] - ay[iy])
            tx = jnp.clip(tx, 0.0, 1.0)
            ty = jnp.clip(ty, 0.0, 1.0)
            v00 = data[ix, iy]
            v10 = data[ix + 1, iy]
            v01 = data[ix, iy + 1]
            v11 = data[ix + 1, iy + 1]
            return (
                v00 * (1 - tx) * (1 - ty)
                + v10 * tx * (1 - ty)
                + v01 * (1 - tx) * ty
                + v11 * tx * ty
            )

        return u
    raise ValueError(f"potential_from_data supports 1-D/2-D data, got ndim={data.ndim}")


def spiral_force(L, a, b, c, d, scale=1e-12):
    """The non-conservative spiral force field of the NC suite
    (``2d_Non_conservative_FPE/testdata_gen.py:18-25``):
    ``F_phi = scale * (r/L) exp(-r b / L) a``, ``F_rad = scale * (1 - r/L) exp(-r d / L) c``.
    Returns a callable (x, y) -> (Fx, Fy) stacked on axis 0."""

    def f(x, y):
        rad = jnp.sqrt(x**2 + y**2)
        phi = jnp.arctan2(y, x)
        f_phi = scale * rad / L * jnp.exp(-rad / L * b) * a
        f_rad = scale * (1 - rad / L) * jnp.exp(-rad / L * d) * c
        fx = -jnp.sin(phi) * f_phi + jnp.cos(phi) * f_rad
        fy = jnp.cos(phi) * f_phi + jnp.sin(phi) * f_rad
        return jnp.stack([fx, fy])

    return f


def quadratic_cos2_potential(a, b, c, x0):
    """The random GPE/Schrodinger potential family
    ``V(x) = a (x - x0)^2 + b cos^2(c (x - x0))`` (``1d_GPE/datagen_schrodinger.py:154``)."""

    def v(x):
        return a * (x - x0) ** 2 + b * jnp.cos(c * (x - x0)) ** 2

    return v
