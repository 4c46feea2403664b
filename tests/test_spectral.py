"""Parity tests: truncated-DFT matmul spectral convs vs jnp.fft reference vs torch.

The torch cross-checks re-state the reference semantics
(rfft/DC-halving/corner-blocks/irfft, /root/reference/1d_FPE/FNOModules.py) independently,
so a shared bug in both JAX paths would still be caught.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from blindno.ops import (
    spectral_conv1d,
    spectral_conv1d_fft,
    spectral_conv2d,
    spectral_conv2d_fft,
    spectral_conv3d,
    spectral_conv3d_fft,
)


def _rand(rng, *shape):
    return rng.standard_normal(shape).astype(np.float32)


@pytest.mark.parametrize("n,modes,dc_half", [(100, 15, True), (160, 40, True), (64, 33, False), (80, 12, False)])
def test_1d_dft_matches_fft(rng, n, modes, dc_half):
    x = _rand(rng, 3, 5, n)
    wr = _rand(rng, 5, 7, modes)
    wi = _rand(rng, 5, 7, modes)
    a = spectral_conv1d(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi), dc_half)
    b = spectral_conv1d_fft(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi), dc_half)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-4)


def test_1d_matches_torch(rng):
    torch = pytest.importorskip("torch")
    n, modes, cin, cout = 100, 15, 4, 6
    x = _rand(rng, 2, cin, n)
    wr = _rand(rng, cin, cout, modes)
    wi = _rand(rng, cin, cout, modes)
    # torch re-statement of the reference 1D layer semantics
    xt = torch.tensor(x)
    w = torch.complex(torch.tensor(wr), torch.tensor(wi))
    xf = torch.fft.rfft(xt)
    xf[:, :, 0] = 0.5 * xf[:, :, 0]
    out = torch.zeros(2, cout, n // 2 + 1, dtype=torch.cfloat)
    out[:, :, :modes] = torch.einsum("bix,iox->box", xf[:, :, :modes], w)
    want = torch.fft.irfft(out, n=n).numpy()
    got = np.asarray(spectral_conv1d(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi), True))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


@pytest.mark.parametrize("h,w,m1,m2", [(76, 76, 32, 32), (61, 61, 12, 12), (100, 80, 20, 16)])
def test_2d_dft_matches_fft(rng, h, w, m1, m2):
    x = _rand(rng, 2, 3, h, w)
    wr = _rand(rng, 3, 4, 2 * m1, m2)
    wi = _rand(rng, 3, 4, 2 * m1, m2)
    a = spectral_conv2d(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi))
    b = spectral_conv2d_fft(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=3e-4, atol=3e-4)


def test_2d_matches_torch(rng):
    torch = pytest.importorskip("torch")
    h, w, m1, m2, cin, cout = 40, 36, 9, 8, 3, 5
    x = _rand(rng, 2, cin, h, w)
    w1r, w1i = _rand(rng, cin, cout, m1, m2), _rand(rng, cin, cout, m1, m2)
    w2r, w2i = _rand(rng, cin, cout, m1, m2), _rand(rng, cin, cout, m1, m2)
    xt = torch.tensor(x)
    wt1 = torch.complex(torch.tensor(w1r), torch.tensor(w1i))
    wt2 = torch.complex(torch.tensor(w2r), torch.tensor(w2i))
    xf = torch.fft.rfft2(xt)
    out = torch.zeros(2, cout, h, w // 2 + 1, dtype=torch.cfloat)
    out[:, :, :m1, :m2] = torch.einsum("bixy,ioxy->boxy", xf[:, :, :m1, :m2], wt1)
    out[:, :, -m1:, :m2] = torch.einsum("bixy,ioxy->boxy", xf[:, :, -m1:, :m2], wt2)
    want = torch.fft.irfft2(out, s=(h, w)).numpy()
    wr = np.concatenate([w1r, w2r], axis=2)
    wi = np.concatenate([w1i, w2i], axis=2)
    got = np.asarray(spectral_conv2d(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi)))
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_3d_dft_matches_fft(rng):
    d1, d2, d3, m1, m2, m3 = 20, 18, 16, 5, 4, 4
    x = _rand(rng, 2, 3, d1, d2, d3)
    wr = _rand(rng, 3, 4, 2 * m1, 2 * m2, m3)
    wi = _rand(rng, 3, 4, 2 * m1, 2 * m2, m3)
    a = spectral_conv3d(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi))
    b = spectral_conv3d_fft(jnp.asarray(x), jnp.asarray(wr), jnp.asarray(wi))
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=5e-4, atol=5e-4)
