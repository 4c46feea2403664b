"""Tests for potential/pdf constructors and interpolation.

The fplanck conventions these tests pin (1/e half-width Gaussians, attractive wells
for A > 0, final-time ``propagate_interval`` semantics) are derived and risk-bounded
in docs/fplanck_conventions.md — fplanck is not installable here, so these tests plus
that note are the behavioral contract with the reference's external solver.
"""
import jax.numpy as jnp
import numpy as np

from blindno.solvers.potentials import (
    combine,
    gaussian_pdf,
    gaussian_potential,
    potential_from_data,
    quadratic_cos2_potential,
    spiral_force,
)


def test_gaussian_potential_well_shape():
    u = gaussian_potential(center=0.0, width=2.0, amplitude=3.0)
    x = jnp.linspace(-5, 5, 11)
    vals = np.asarray(u(x))
    assert np.isclose(vals[5], -3.0)  # well depth at center
    assert vals.min() == vals[5]
    # 1/e half-width convention: U(width) = -A/e
    assert np.isclose(float(u(jnp.asarray([2.0]))[0]), -3.0 / np.e, rtol=1e-5)


def test_combine_sums():
    u1 = gaussian_potential(0.0, 1.0, 1.0)
    u2 = gaussian_potential(2.0, 1.0, 2.0)
    x = jnp.linspace(-3, 3, 7)
    np.testing.assert_allclose(
        np.asarray(combine(u1, u2)(x)), np.asarray(u1(x)) + np.asarray(u2(x)), rtol=1e-6
    )


def test_potential_from_data_1d_interpolates():
    x = jnp.linspace(0.0, 1.0, 11)
    data = x**2
    u = potential_from_data(x, data)
    q = jnp.asarray([0.05, 0.55, 0.95])
    got = np.asarray(u(q))
    # linear interpolation between grid values
    want = np.interp(np.asarray(q), np.asarray(x), np.asarray(data))
    np.testing.assert_allclose(got, want, rtol=1e-6)


def test_potential_from_data_2d_bilinear():
    ax = jnp.linspace(0.0, 1.0, 5)
    ay = jnp.linspace(0.0, 2.0, 9)
    gx, gy = jnp.meshgrid(ax, ay, indexing="ij")
    data = 2.0 * gx + 3.0 * gy  # bilinear-exact field
    u = potential_from_data((gx, gy), data)
    qx = jnp.asarray([0.1, 0.6, 0.99])
    qy = jnp.asarray([0.3, 1.1, 1.9])
    got = np.asarray(u(qx, qy))
    np.testing.assert_allclose(got, 2.0 * np.asarray(qx) + 3.0 * np.asarray(qy), rtol=1e-5)


def test_spiral_force_rotates():
    f = spiral_force(L=1.0, a=1.0, b=0.0, c=0.0, d=0.0, scale=1.0)
    fx, fy = np.asarray(f(jnp.asarray([1.0]), jnp.asarray([0.0])))
    # pure azimuthal at (1, 0): F = (0, +r/L)
    np.testing.assert_allclose([fx[0], fy[0]], [0.0, 1.0], atol=1e-6)


def test_quadratic_cos2_family():
    v = quadratic_cos2_potential(0.2, 1.5, 2.0, 0.5)
    x = jnp.asarray([0.5])
    np.testing.assert_allclose(float(v(x)[0]), 1.5, rtol=1e-6)  # a*(0)^2 + b*cos^2(0)


def test_gaussian_pdf_peak():
    p = gaussian_pdf(center=(0.0, 0.0), width=1.0)
    x = jnp.asarray([0.0, 1.0])
    y = jnp.asarray([0.0, 0.0])
    vals = np.asarray(p(x, y))
    assert np.isclose(vals[0], 1.0)
    assert np.isclose(vals[1], np.exp(-1.0))
