"""Differentiable fused FNO layer (blindno.ops.fno_layer): value + gradient parity
against the jnp path, and the full FNO module under impl='pallas_fused'."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.ops.fno_layer import fno1d_layer, fno2d_layer
from blindno.ops.spectral import spectral_conv1d, spectral_conv2d


def _ref1d(x, wr, wi, pk, pb, act):
    y = spectral_conv1d(x, wr, wi, dc_half=True) + (
        jnp.einsum("io,bin->bon", pk, x) + pb.reshape(1, -1, 1)
    )
    return jax.nn.gelu(y, approximate=False) if act else y


def _ref2d(x, wr, wi, pk, pb, act):
    y = spectral_conv2d(x, wr, wi) + (
        jnp.einsum("io,bihw->bohw", pk, x) + pb.reshape(1, -1, 1, 1)
    )
    return jax.nn.gelu(y, approximate=False) if act else y


def _rand1d(rng, b=3, cin=6, cout=5, n=100, modes=15):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return r(b, cin, n), r(cin, cout, modes) * 0.1, r(cin, cout, modes) * 0.1, r(cin, cout), r(cout)


def _rand2d(rng, b=2, cin=5, cout=4, h=40, w=36, m1=9, m2=8):
    r = lambda *s: jnp.asarray(rng.standard_normal(s).astype(np.float32))
    return (r(b, cin, h, w), r(cin, cout, 2 * m1, m2) * 0.1,
            r(cin, cout, 2 * m1, m2) * 0.1, r(cin, cout), r(cout))


@pytest.mark.parametrize("act", [True, False])
def test_fno1d_layer_value_and_grads(rng, act):
    args = _rand1d(rng)
    got = fno1d_layer(*args, apply_act=act, interpret=True)
    want = _ref1d(*args, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    loss_fused = lambda *a: (fno1d_layer(*a, apply_act=act, interpret=True) ** 2).mean()
    loss_ref = lambda *a: (_ref1d(*a, act) ** 2).mean()
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-5)


@pytest.mark.parametrize("act", [True, False])
def test_fno2d_layer_value_and_grads(rng, act):
    args = _rand2d(rng)
    got = fno2d_layer(*args, apply_act=act, interpret=True)
    want = _ref2d(*args, act)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)

    loss_fused = lambda *a: (fno2d_layer(*a, apply_act=act, interpret=True) ** 2).mean()
    loss_ref = lambda *a: (_ref2d(*a, act) ** 2).mean()
    g_fused = jax.grad(loss_fused, argnums=(0, 1, 2, 3, 4))(*args)
    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3, 4))(*args)
    for gf, gr in zip(g_fused, g_ref):
        np.testing.assert_allclose(np.asarray(gf), np.asarray(gr), rtol=5e-4, atol=5e-5)


def test_fno_modules_under_fused_impl(rng):
    """FNO1d/FNO2d forward + grads agree between impl='jnp' and 'pallas_fused',
    with an identical param tree (checkpoints are interchangeable)."""
    from blindno.nn.fno import FNO1d, FNO2d
    from blindno.ops.config import set_spectral_impl

    try:
        m1 = FNO1d(modes=8, width=6, n_layers=2, input_dim=2, output_dim=1)
        x1 = jnp.asarray(rng.standard_normal((2, 64, 2)).astype(np.float32))
        v1 = m1.init(jax.random.PRNGKey(0), x1)

        m2 = FNO2d(modes=6, width=4, n_layers=2, input_dim=3, output_dim=1)
        x2 = jnp.asarray(rng.standard_normal((2, 24, 24, 3)).astype(np.float32))
        v2 = m2.init(jax.random.PRNGKey(0), x2)

        for model, x, v in ((m1, x1, v1), (m2, x2, v2)):
            set_spectral_impl("jnp")
            y_jnp = model.apply(v, x)
            g_jnp = jax.grad(lambda p: (model.apply(p, x) ** 2).mean())(v)
            set_spectral_impl("pallas_fused")
            # param tree must be identical so the impls share checkpoints
            assert jax.tree.structure(model.init(jax.random.PRNGKey(0), x)) == jax.tree.structure(v)
            y_pal = model.apply(v, x)
            g_pal = jax.grad(lambda p: (model.apply(p, x) ** 2).mean())(v)
            np.testing.assert_allclose(np.asarray(y_pal), np.asarray(y_jnp), rtol=3e-4, atol=3e-4)
            for gp, gj in zip(jax.tree.leaves(g_pal), jax.tree.leaves(g_jnp)):
                np.testing.assert_allclose(np.asarray(gp), np.asarray(gj), rtol=1e-3, atol=1e-4)
    finally:
        set_spectral_impl("jnp")
