"""Multi-device tests on the virtual 8-device CPU mesh: DP training equivalence and
TP param sharding."""
import jax
import jax.numpy as jnp
import numpy as np

from blindno.parallel.mesh import data_mesh, shard_batch, replicate
from blindno.parallel.tp import tp_shard_params


def test_data_mesh_respects_batch_divisibility():
    assert data_mesh(batch_size=8).shape["data"] == 8
    assert data_mesh(batch_size=6).shape["data"] == 6
    assert data_mesh(batch_size=7).shape["data"] == 7
    assert data_mesh(batch_size=5).shape["data"] == 5
    assert data_mesh(batch_size=9).shape["data"] == 3


def test_dp_matches_single_device_loss():
    """A jitted MSE loss over a DP-sharded batch must equal the unsharded value."""
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))
    w = jnp.asarray(rng.standard_normal((32, 4)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((16, 4)).astype(np.float32))

    def loss(w, x, y):
        return jnp.mean((x @ w - y) ** 2)

    base = float(jax.jit(loss)(w, x, y))
    mesh = data_mesh(batch_size=16)
    xs = shard_batch(x, mesh)
    ys = shard_batch(y, mesh)
    wr = replicate(w, mesh)
    sharded = float(jax.jit(loss)(wr, xs, ys))
    np.testing.assert_allclose(sharded, base, rtol=1e-6)
    # gradient all-reduce across the mesh matches too
    g_base = jax.jit(jax.grad(loss))(w, x, y)
    g_shard = jax.jit(jax.grad(loss))(wr, xs, ys)
    np.testing.assert_allclose(np.asarray(g_shard), np.asarray(g_base), rtol=1e-5)


def test_tp_shard_params_preserves_values():
    from blindno.parallel.mesh import data_model_mesh

    mesh = data_model_mesh(n_model=2)
    rng = np.random.default_rng(0)
    params = {
        "spectral": {"weights_re": jnp.asarray(rng.standard_normal((4, 8, 12)).astype(np.float32))},
        "dense": {"kernel": jnp.asarray(rng.standard_normal((16, 32)).astype(np.float32))},
        "norm": {"scale": jnp.ones((7,))},  # not divisible -> replicated
    }
    sharded = tp_shard_params(params, mesh)
    for path in (("spectral", "weights_re"), ("dense", "kernel"), ("norm", "scale")):
        a = params[path[0]][path[1]]
        b = sharded[path[0]][path[1]]
        np.testing.assert_allclose(np.asarray(b), np.asarray(a))
    # the spectral weight's out-channel axis is actually sharded over 'model'
    spec = sharded["spectral"]["weights_re"].sharding.spec
    assert "model" in tuple(spec)
