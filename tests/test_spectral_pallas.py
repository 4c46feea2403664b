"""Pallas fused FNO-layer kernels vs the jnp reference path (interpret mode on CPU)."""
import jax
import jax.numpy as jnp
import numpy as np

from blindno.ops.spectral import spectral_conv1d, spectral_conv2d
from blindno.ops.spectral_pallas import fno1d_layer_pallas, fno2d_layer_pallas


def _ref_layer1d(x, wr, wi, pw, pb, act):
    spec = spectral_conv1d(x, wr, wi, dc_half=True)
    point = jnp.einsum("io,bin->bon", pw, x) + pb.reshape(1, -1, 1)
    y = spec + point
    return jax.nn.gelu(y, approximate=False) if act else y


def _ref_layer2d(x, wr, wi, pw, pb, act):
    spec = spectral_conv2d(x, wr, wi)
    point = jnp.einsum("io,bihw->bohw", pw, x) + pb.reshape(1, -1, 1, 1)
    y = spec + point
    return jax.nn.gelu(y, approximate=False) if act else y


def test_fno1d_layer_pallas_matches(rng):
    b, c, n, modes = 3, 8, 100, 15
    x = jnp.asarray(rng.standard_normal((b, c, n)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((c, c, modes)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((c, c, modes)).astype(np.float32))
    pw = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32))
    pb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    for act in (True, False):
        got = fno1d_layer_pallas(x, wr, wi, pw, pb, apply_act=act, interpret=True)
        want = _ref_layer1d(x, wr, wi, pw, pb, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)


def test_fno2d_layer_pallas_matches(rng):
    b, c, h, w, m1, m2 = 2, 6, 40, 36, 9, 8
    x = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((c, c, 2 * m1, m2)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((c, c, 2 * m1, m2)).astype(np.float32))
    pw = jnp.asarray(rng.standard_normal((c, c)).astype(np.float32))
    pb = jnp.asarray(rng.standard_normal((c,)).astype(np.float32))
    for act in (True, False):
        got = fno2d_layer_pallas(x, wr, wi, pw, pb, apply_act=act, interpret=True)
        want = _ref_layer2d(x, wr, wi, pw, pb, act)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=3e-4, atol=3e-4)


def test_spectral_only_kernels_match(rng):
    from blindno.ops.spectral_pallas import spectral_conv1d_pallas, spectral_conv2d_pallas

    b, c, n, modes = 2, 6, 100, 15
    x = jnp.asarray(rng.standard_normal((b, c, n)).astype(np.float32))
    wr = jnp.asarray(rng.standard_normal((c, c, modes)).astype(np.float32))
    wi = jnp.asarray(rng.standard_normal((c, c, modes)).astype(np.float32))
    got = spectral_conv1d_pallas(x, wr, wi, interpret=True)
    want = spectral_conv1d(x, wr, wi, dc_half=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=2e-4, atol=2e-4)

    h, w, m1, m2 = 40, 36, 9, 8
    x2 = jnp.asarray(rng.standard_normal((b, c, h, w)).astype(np.float32))
    wr2 = jnp.asarray(rng.standard_normal((c, c, 2 * m1, m2)).astype(np.float32))
    wi2 = jnp.asarray(rng.standard_normal((c, c, 2 * m1, m2)).astype(np.float32))
    got2 = spectral_conv2d_pallas(x2, wr2, wi2, interpret=True)
    want2 = spectral_conv2d(x2, wr2, wi2)
    np.testing.assert_allclose(np.asarray(got2), np.asarray(want2), rtol=3e-4, atol=3e-4)
