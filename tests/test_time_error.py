"""Tests for the solution-space time-error metric."""
import jax.numpy as jnp
import numpy as np

from blindno.eval.time_error import (
    fpe1d_rollout_error,
    gpe_rollout_error,
    time_averaged_rel_l2,
)
from blindno.data.generate import NM, BASE_DRAG


def test_metric_zero_for_identical():
    t = jnp.linspace(0.0, 1.0, 5)
    x = jnp.linspace(0.0, 1.0, 8)
    rho = jnp.ones((5, 8)) + jnp.sin(x)[None]
    assert float(time_averaged_rel_l2(rho, rho, [x], t)) == 0.0


def test_metric_scale_invariance():
    """Relative error is invariant to a global rescale of both trajectories."""
    rng = np.random.default_rng(0)
    t = jnp.linspace(0.0, 1.0, 6)
    x = jnp.linspace(0.0, 1.0, 10)
    a = jnp.asarray(np.abs(rng.standard_normal((6, 10))) + 0.5)
    b = a + 0.01 * jnp.asarray(rng.standard_normal((6, 10)))
    e1 = float(time_averaged_rel_l2(a, b, [x], t))
    e2 = float(time_averaged_rel_l2(10 * a, 10 * b, [x], t))
    np.testing.assert_allclose(e1, e2, rtol=1e-5)
    assert 0 < e1 < 0.1


def test_fpe1d_rollout_error_orders():
    """Exact coefficients -> ~0 error; perturbed potential -> larger error."""
    x = np.linspace(-400 * NM, 390 * NM, 80)
    u = -1.5e-20 * np.exp(-((x / (60 * NM)) ** 2))
    u_batch = jnp.asarray(np.stack([u, u]), jnp.float32)
    drag = jnp.asarray([BASE_DRAG, BASE_DRAG], jnp.float32)
    u_pred = jnp.asarray(np.stack([u, u * 0.5]), jnp.float32)
    errs = np.asarray(fpe1d_rollout_error(u_batch, drag, u_pred, drag, nsteps=50))
    assert errs[0] < 1e-4
    assert errs[1] > 10 * max(errs[0], 1e-6)


def test_gpe_rollout_error_orders():
    x = np.linspace(-10, 10, 64)
    v = 0.2 * x**2
    v_b = jnp.asarray(np.stack([v, v]), jnp.float32)
    v_p = jnp.asarray(np.stack([v, v * 1.3]), jnp.float32)
    g = jnp.asarray([0.0, 0.0])
    k = jnp.asarray([0.0, 0.0])
    errs = np.asarray(gpe_rollout_error(v_b, v_p, g, k, nx=64, dt=0.01, t_final=0.5))
    assert errs[0] < 1e-5
    assert errs[1] > 10 * max(errs[0], 1e-6)
