"""Shape / permutation-invariance / grad tests for 1-D NIO models."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.models.nio1d import NIOFP1D, NIOFNO1D


def _data(rng, b=2, l=6, n=80):
    x = jnp.asarray(rng.standard_normal((b, l, n)).astype(np.float32))
    grid = jnp.linspace(0.0, 1.0, n).reshape(n, 1).astype(jnp.float32)
    return x, grid


@pytest.mark.parametrize(
    "cls,heads",
    [
        (NIOFP1D, (1, 1)),
        (NIOFP1D, (1,)),
        (NIOFP1D, (1, 2)),
        (NIOFNO1D, (1, 1)),
    ],
)
def test_shapes_and_perm_invariance(rng, cls, heads):
    x, grid = _data(rng)
    if cls is NIOFP1D:
        model = cls(width=8, modes=8, n_basis=5, neurons=16, head_dims=heads)
    else:
        model = cls(width=8, modes=8, head_dims=heads)
    variables = model.init(jax.random.PRNGKey(0), x, grid)
    out = model.apply(variables, x, grid)
    assert out.shape == (2, 80, sum(heads))
    # permutation invariance over the snapshot set in eval mode
    perm = jnp.asarray(np.random.default_rng(1).permutation(x.shape[1]))
    out_p = model.apply(variables, x[:, perm], grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), rtol=1e-4, atol=1e-5)


def test_train_mode_runs_and_grads(rng):
    x, grid = _data(rng)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16)
    variables = model.init(jax.random.PRNGKey(0), x, grid)
    params = variables["params"]
    target = jnp.zeros((2, 80, 2))

    def loss_fn(p):
        out, updates = model.apply(
            {"params": p, "batch_stats": variables["batch_stats"]},
            x,
            grid,
            training=True,
            rngs={"sample": jax.random.PRNGKey(1)},
            mutable=["batch_stats"],
        )
        return jnp.mean((out - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss))
    # fusion weights are frozen (reference .data quirk) -> zero grads there
    fusion_grads = grads["MeanFieldFusion_0"]
    assert float(jnp.abs(fusion_grads["kernel"]).max()) == 0.0
    # but FNO head grads flow
    leaves = jax.tree.leaves(grads)
    assert any(float(jnp.abs(g).max()) > 0 for g in leaves)


def test_niofp_ode_forward(rng):
    """NIOFPOde vestige (2d_FPE/NIOModules.py:655-717): (B, L, 11) obs -> (B, N, 1)."""
    from blindno.models.nio1d import NIOFPOde

    x = jnp.asarray(rng.standard_normal((2, 20, 11)).astype(np.float32))
    grid = jnp.linspace(0, 1, 100, dtype=jnp.float32).reshape(100, 1)
    model = NIOFPOde(width=8, modes=8, n_basis=5, neurons=16)
    variables = model.init(jax.random.PRNGKey(0), x, grid)
    out = model.apply(variables, x, grid)
    assert out.shape == (2, 100, 1)
    assert np.isfinite(np.asarray(out)).all()
