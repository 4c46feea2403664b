"""Physics validation of the Fokker-Planck master-equation solver.

The reference has no solver tests (it trusts fplanck); here every property that the
datasets depend on is checked: mass conservation, Boltzmann stationarity, free
diffusion rate, eigh-vs-expm path agreement, and 2-D space-varying drag.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.solvers.fokker_planck import (
    KB,
    FokkerPlanck,
    build_generator,
    propagate_eigh,
    propagate_expm,
)
from blindno.solvers.potentials import (
    combine,
    gaussian_pdf,
    gaussian_potential,
    spiral_force,
)

nm = 1e-9
TEMP = 300.0
DRAG = 6 * np.pi * 8e-4 * 50 * nm


def _sim_1d(**kw):
    u = combine(
        gaussian_potential(center=0.0, width=40 * nm, amplitude=1.5e-20),
        gaussian_potential(center=100 * nm, width=60 * nm, amplitude=1e-20),
    )
    return FokkerPlanck(
        temperature=TEMP, drag=DRAG, extent=800 * nm, resolution=10 * nm, potential=u, **kw
    )


def test_grid_sizes_match_fplanck():
    s1 = _sim_1d()
    assert s1.potential_values.shape == (80,)
    s2 = FokkerPlanck(
        temperature=TEMP,
        drag=DRAG,
        extent=[600 * nm, 600 * nm],
        resolution=10 * nm,
        potential=gaussian_potential(center=(0.0, 0.0), width=50 * nm, amplitude=1e-20),
    )
    assert s2.potential_values.shape == (61, 61)


def test_mass_conservation_and_positivity():
    sim = _sim_1d()
    t, pt = sim.propagate_interval(gaussian_pdf(center=0.0, width=50 * nm), 2e-3, Nsteps=50)
    total = np.asarray(pt.sum(axis=1))
    np.testing.assert_allclose(total, 1.0, rtol=1e-5)
    assert float(pt.min()) > -1e-7


def test_boltzmann_stationary_distribution(x64):
    sim = _sim_1d()
    beta = 1.0 / (KB * TEMP)
    # evolve long enough to equilibrate (relaxation ~ L^2/D ~ 0.1 s)
    t, pt = sim.propagate_interval(gaussian_pdf(center=0.0, width=50 * nm), 2.0, Nsteps=5)
    u = np.asarray(sim.potential_values)
    pi = np.exp(-beta * (u - u.min()))
    pi /= pi.sum()
    np.testing.assert_allclose(np.asarray(pt[-1]), pi, rtol=1e-3, atol=1e-8)


def test_free_diffusion_variance_growth():
    sim = FokkerPlanck(temperature=TEMP, drag=DRAG, extent=1600 * nm, resolution=10 * nm)
    d = float(sim.diffusion.ravel()[0])
    tf = 1e-3
    t, pt = sim.propagate_interval(gaussian_pdf(center=0.0, width=30 * nm), tf, Nsteps=3)
    x = np.asarray(sim.axes[0])
    var = [float((np.asarray(p) * x**2).sum() - ((np.asarray(p) * x).sum()) ** 2) for p in pt]
    # var(t) = var(0) + 2 D t while far from the walls
    np.testing.assert_allclose(var[-1] - var[0], 2 * d * tf, rtol=2e-2)


def test_eigh_matches_expm_conservative():
    sim = _sim_1d()
    coords = jnp.meshgrid(*sim.axes, indexing="ij")
    p0 = gaussian_pdf(center=0.0, width=50 * nm)(*coords).ravel()
    p0 = p0 / p0.sum()
    times = jnp.linspace(0.0, 2e-3, 11).astype(sim.dtype)
    a = propagate_eigh(sim.potential_values, sim.diffusion, sim.resolution, sim.beta, p0, times)
    b = propagate_expm(sim.potential_values, sim.diffusion, sim.resolution, sim.beta, p0, times)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-7)


def test_2d_space_varying_drag_boltzmann(x64):
    u = gaussian_potential(center=(0.0, 0.0), width=60 * nm, amplitude=1.2e-20)

    def drag_fn(x, y):
        return DRAG * (1 + 0.5 * (x / (250 * nm)) ** 2 + 0.5 * (y / (250 * nm)) ** 2)

    sim = FokkerPlanck(
        temperature=TEMP,
        drag=drag_fn,
        extent=[300 * nm, 300 * nm],
        resolution=20 * nm,
        potential=u,
    )
    t, pt = sim.propagate_interval(gaussian_pdf(center=(0.0, 0.0), width=50 * nm), 2.0, Nsteps=3)
    beta = 1.0 / (KB * TEMP)
    uu = np.asarray(sim.potential_values)
    pi = np.exp(-beta * (uu - uu.min()))
    pi /= pi.sum()
    # stationary state independent of the drag field (detailed balance preserved)
    np.testing.assert_allclose(np.asarray(pt[-1]).ravel(), pi.ravel(), rtol=2e-3, atol=1e-8)


def test_nonconservative_force_conserves_mass():
    f = spiral_force(L=100 * nm, a=1.0, b=1.0, c=1.0, d=1.0)
    sim = FokkerPlanck(
        temperature=TEMP,
        drag=DRAG,
        extent=[400 * nm, 400 * nm],
        resolution=20 * nm,
        force=f,
    )
    t, pt = sim.propagate_interval(
        gaussian_pdf(center=(-150 * nm, -150 * nm), width=30 * nm), 1e-2, Nsteps=20
    )
    total = np.asarray(pt.reshape(20, -1).sum(axis=1))
    # float32 matvec accumulation drifts O(1e-5) over 20 steps; exact in the scheme
    np.testing.assert_allclose(total, 1.0, rtol=2e-4)
    # the spiral force must actually move probability around (non-trivial dynamics)
    assert float(jnp.abs(pt[-1] - pt[0]).max()) > 1e-6


def test_constant_force_tilts_distribution(x64):
    """Uniform force F shifts the stationary state to exp(beta F x)."""
    fmag = 2e-14

    def f(x):
        return jnp.stack([jnp.full_like(x, fmag)])

    sim = FokkerPlanck(
        temperature=TEMP, drag=DRAG, extent=400 * nm, resolution=10 * nm, force=f
    )
    t, pt = sim.propagate_interval(gaussian_pdf(center=0.0, width=50 * nm), 2.0, Nsteps=3)
    x = np.asarray(sim.axes[0])
    beta = 1.0 / (KB * TEMP)
    pi = np.exp(beta * fmag * x)
    pi /= pi.sum()
    np.testing.assert_allclose(np.asarray(pt[-1]), pi, rtol=5e-3, atol=1e-9)


def test_expm_markov_matches_pade(x64):
    """The matmul-only uniformization expm (used for N>=4096 generators where the
    Pade LU block exceeds v5e scoped VMEM) must match jax.scipy expm, including with
    a non-conservative force."""
    from blindno.solvers.fokker_planck import build_generator, expm_markov

    rng = np.random.default_rng(0)
    x = np.linspace(-1, 1, 24)
    gx, gy = np.meshgrid(x, x, indexing="ij")
    u = jnp.asarray(np.exp(-(gx**2 + gy**2)), jnp.float64) * 2.0
    f = jnp.asarray(rng.standard_normal((2, 24, 24)), jnp.float64) * 0.5
    m = build_generator(u, 0.7, 2.0 / 23, beta=1.0, force=f)
    dt = 0.05  # lam*dt in the same regime as the NC datasets (a ~ 5-20)
    want = jax.scipy.linalg.expm(m * dt)
    got = expm_markov(m, dt)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)
    # column sums are exactly preserved (mass conservation of the propagator)
    np.testing.assert_allclose(np.asarray(got.sum(axis=0)), 1.0, atol=1e-9)


def test_expm_markov_f32_vmapped(rng):
    """f32 + vmap path as used by the NC datagen batch solve."""
    from blindno.solvers.fokker_planck import build_generator, expm_markov

    x = np.linspace(-1, 1, 16)
    gx, gy = np.meshgrid(x, x, indexing="ij")
    us = jnp.asarray(rng.standard_normal((3, 16, 16)).astype(np.float32))

    def prop(u):
        m = build_generator(u, 0.5, 2.0 / 15, beta=1.0)
        return expm_markov(m, 0.02), jax.scipy.linalg.expm(m * 0.02)

    got, want = jax.vmap(prop)(us)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-6)


def test_expm_markov_large_a_near_guard(x64):
    """Pin expm_markov at large ``lam*dt`` near the max_terms guard (the regime the
    docstring bounds but the NC suite's a~5-20 never exercises).

    (1) at lam*dt ~ 600 (30-100x the dataset regime; scaled series a=37.5 under the
    default squarings=4) the series must still match Pade; (2) a max_terms just
    above the tail bound stays finite and correct; (3) crossing the bound must
    NaN-poison the WHOLE propagator — never a silently-renormalized wrong answer
    (the column renormalization would otherwise mask the truncation)."""
    from blindno.solvers.fokker_planck import build_generator, expm_markov

    x = np.linspace(-1, 1, 20)
    gx, gy = np.meshgrid(x, x, indexing="ij")
    u = jnp.asarray(np.exp(-(gx**2 + gy**2)), jnp.float64) * 2.0
    m = build_generator(u, 0.7, 2.0 / 19, beta=1.0)
    lam = float(np.max(-np.diagonal(np.asarray(m)))) * (1.0 + 1e-6)
    dt = 600.0 / lam  # scaled a = 600 / 2^4 = 37.5; tail bound ~ 108.7 terms
    a = 600.0 / 16.0
    need = a + 10.0 * np.sqrt(a) + 10.0
    want = jax.scipy.linalg.expm(m * dt)
    got = expm_markov(m, dt)
    assert np.isfinite(np.asarray(got)).all()
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(got.sum(axis=0)), 1.0, atol=1e-9)
    # (2) just-above-the-bound max_terms: still finite and identical
    tight = expm_markov(m, dt, max_terms=int(need) + 2)
    np.testing.assert_allclose(np.asarray(tight), np.asarray(got), rtol=1e-9, atol=1e-12)
    # (3) just-below: the guard fires and poisons every entry
    poisoned = expm_markov(m, dt, max_terms=int(need) - 2)
    assert np.isnan(np.asarray(poisoned)).all()


def test_expm_markov_squarings_consistent(x64):
    """Scaling-and-squaring (the NC datagen speedup) must agree with the plain
    series and with Pade, at several squaring depths."""
    from blindno.solvers.fokker_planck import build_generator, expm_markov

    rng = np.random.default_rng(3)
    x = np.linspace(-1, 1, 20)
    gx, gy = np.meshgrid(x, x, indexing="ij")
    u = jnp.asarray(np.exp(-(gx**2 + gy**2)), jnp.float64) * 2.0
    f = jnp.asarray(rng.standard_normal((2, 20, 20)), jnp.float64) * 0.5
    m = build_generator(u, 0.7, 2.0 / 19, beta=1.0, force=f)
    dt = 0.05
    want = jax.scipy.linalg.expm(m * dt)
    plain = expm_markov(m, dt, squarings=0)
    for k in (2, 4, 6):
        got = expm_markov(m, dt, squarings=k)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(got), np.asarray(plain), rtol=1e-6, atol=1e-9)
        np.testing.assert_allclose(np.asarray(got.sum(axis=0)), 1.0, atol=1e-9)
