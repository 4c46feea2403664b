"""Physics validation of the split-step Schrodinger/GPE solver."""
import jax.numpy as jnp
import numpy as np

from blindno.solvers.gpe import get_initial_condition, solve_gpe, solve_gpe_batch, time_grid
from blindno.solvers.potentials import quadratic_cos2_potential


def _setup(nx=128):
    x = jnp.linspace(-10.0, 10.0, nx)
    return x


def test_norm_conservation_schrodinger():
    x = _setup()
    v = quadratic_cos2_potential(0.2, 1.0, 1.0, 0.5)(x)
    psi0 = get_initial_condition(2, x)
    t, nt = time_grid(0.005, 5.0)
    rec = solve_gpe(psi0, x, 0.005, nt, 0.0, 0.0, v)
    norms = np.asarray(jnp.sum(jnp.abs(rec) ** 2, axis=1))
    np.testing.assert_allclose(norms, norms[0], rtol=1e-4)


def test_norm_conservation_gpe_nonlinear():
    x = _setup()
    v = quadratic_cos2_potential(0.15, 0.8, 1.5, -1.0)(x)
    psi0 = get_initial_condition(2, x)
    t, nt = time_grid(0.005, 1.0)
    rec = solve_gpe(psi0, x, 0.005, nt, 2.0, 2.0, v)
    norms = np.asarray(jnp.sum(jnp.abs(rec) ** 2, axis=1))
    np.testing.assert_allclose(norms, norms[0], rtol=1e-4)


def test_harmonic_ground_state_is_stationary():
    """For V = x^2/2 the Gaussian ground state only acquires a phase: |psi| static."""
    x = jnp.linspace(-12.0, 12.0, 256)
    v = 0.5 * x**2
    psi0 = jnp.exp(-(x**2) / 2.0).astype(jnp.complex64)
    rec = solve_gpe(psi0, x, 0.002, 501, 0.0, 0.0, v)
    a0 = np.abs(np.asarray(rec[0]))
    a1 = np.abs(np.asarray(rec[-1]))
    np.testing.assert_allclose(a1, a0, atol=2e-4)
    # and the phase advances at E0 = 1/2: psi(t) = psi0 e^{-i t/2}
    mid = x.shape[0] // 2
    phase = np.angle(np.asarray(rec[-1])[mid] / np.asarray(rec[0])[mid])
    expected = (-0.5 * 0.002 * 500) % (2 * np.pi)
    got = phase % (2 * np.pi)
    assert min(abs(got - expected), 2 * np.pi - abs(got - expected)) < 5e-3


def test_strang_vs_yoshida_order():
    """4th-order splitting should agree with 2nd order and be closer to a fine solve."""
    x = _setup(96)
    v = quadratic_cos2_potential(0.2, 1.0, 1.0, 0.0)(x)
    psi0 = get_initial_condition(2, x)
    coarse2 = solve_gpe(psi0, x, 0.02, 51, 1.0, 0.5, v, order=2)[-1]
    coarse4 = solve_gpe(psi0, x, 0.02, 51, 1.0, 0.5, v, order=4)[-1]
    fine = solve_gpe(psi0, x, 0.002, 501, 1.0, 0.5, v, order=2)[-1]
    err2 = float(jnp.linalg.norm(coarse2 - fine))
    err4 = float(jnp.linalg.norm(coarse4 - fine))
    assert err4 < err2


def test_batch_solver_matches_single():
    x = _setup(64)
    v = jnp.stack(
        [
            quadratic_cos2_potential(0.2, 1.0, 1.0, 0.0)(x),
            quadratic_cos2_potential(0.3, 0.5, 2.0, 1.0)(x),
        ]
    )
    g = jnp.asarray([0.0, 2.0])
    kappa = jnp.asarray([0.0, 2.0])
    psi0 = get_initial_condition(2, x)
    batch = solve_gpe_batch(psi0, x, 0.01, 101, g, kappa, v)
    for i in range(2):
        single = solve_gpe(psi0, x, 0.01, 101, g[i], kappa[i], v[i])
        np.testing.assert_allclose(np.asarray(batch[i]), np.asarray(single), atol=1e-5)
