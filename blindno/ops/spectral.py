"""Spectral convolution ops: mode-truncated Fourier layers as MXU matmul chains.

Functional core used by :mod:`blindno.nn.fno`. Two interchangeable implementations:

- ``spectral_conv{1,2,3}d``      — truncated-DFT matmuls (see :mod:`blindno.ops.dft`);
  the production TPU path. No FFT, no full-spectrum materialization, no complex dtype.
- ``spectral_conv{1,2,3}d_fft``  — straightforward ``jnp.fft`` reference used for parity
  tests and as a readable specification of the semantics.

Semantics match the reference Fourier layers exactly:
- 1D: ``rfft -> halve DC -> complex einsum over first `modes` -> irfft``
  (``/root/reference/1d_FPE/FNOModules.py:47-59``).
- 2D: ``rfft2 -> two +/- row blocks x first modes2 cols -> irfft2`` (``:146-161``).
- 3D: ``rfftn -> four +/- corner blocks -> irfftn`` (``:253-271``).

Weights are carried as separate real/imag arrays (optimizer-friendly; equals the
reference's cfloat parameters).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from blindno.ops.dft import rdft_forward, rdft_inverse, dft_forward_pm, dft_inverse_pm

# Spectral mixing is numerically sensitive (it IS the operator); keep f32 accumulate.
PRECISION = lax.Precision.HIGHEST


def _cmul_mix(xr, xi, wr, wi, subscript):
    """(xr + i xi) x (wr + i wi) channel mix along shared mode axes."""
    ein = lambda a, b: jnp.einsum(subscript, a, b, precision=PRECISION)
    return ein(xr, wr) - ein(xi, wi), ein(xr, wi) + ein(xi, wr)


# ---------------------------------------------------------------------------- 1D

def spectral_conv1d(x, wr, wi, dc_half: bool = True):
    """x: (B, Cin, N) real; wr/wi: (Cin, Cout, modes). Returns (B, Cout, N)."""
    n = x.shape[-1]
    modes = wr.shape[-1]
    fre, fim = rdft_forward(n, modes, x.dtype, dc_half=dc_half)
    gre, gim = rdft_inverse(n, modes, x.dtype)
    mm = lambda a, b: jnp.einsum("bcn,nk->bck", a, b, precision=PRECISION)
    xr, xi = mm(x, fre), mm(x, fim)
    outr, outi = _cmul_mix(xr, xi, wr, wi, "bik,iok->bok")
    imm = lambda a, b: jnp.einsum("bok,kn->bon", a, b, precision=PRECISION)
    return imm(outr, gre) + imm(outi, gim)


def spectral_conv1d_fft(x, wr, wi, dc_half: bool = True):
    """jnp.fft reference for :func:`spectral_conv1d`."""
    n = x.shape[-1]
    modes = wr.shape[-1]
    w = (wr + 1j * wi).astype(jnp.complex64)
    xf = jnp.fft.rfft(x)
    if dc_half:
        xf = xf.at[..., 0].multiply(0.5)
    out = jnp.einsum("bik,iok->bok", xf[..., :modes], w, precision=PRECISION)
    full = jnp.zeros(x.shape[:-2] + (wr.shape[1], n // 2 + 1), jnp.complex64)
    full = full.at[..., :modes].set(out)
    return jnp.fft.irfft(full, n=n).astype(x.dtype)


# ---------------------------------------------------------------------------- 2D

def spectral_conv2d(x, wr, wi):
    """x: (B, Cin, H, W) real; wr/wi: (Cin, Cout, 2*modes1, modes2) with the +/- row
    blocks stacked along axis 2 (rows [0:m1] then [H-m1:H]). Returns (B, Cout, H, W)."""
    h, w_len = x.shape[-2], x.shape[-1]
    m1 = wr.shape[2] // 2
    m2 = wr.shape[3]
    fyre, fyim = rdft_forward(w_len, m2, x.dtype)
    fxre, fxim = dft_forward_pm(h, m1, x.dtype)
    gxre, gxim = dft_inverse_pm(h, m1, x.dtype)
    gyre, gyim = rdft_inverse(w_len, m2, x.dtype)

    ein = lambda s, a, b: jnp.einsum(s, a, b, precision=PRECISION)
    # truncated rDFT along W (real input)
    yr = ein("bchw,wm->bchm", x, fyre)
    yi = ein("bchw,wm->bchm", x, fyim)
    # +/- block DFT along H (complex input)
    xr = ein("bchm,hk->bckm", yr, fxre) - ein("bchm,hk->bckm", yi, fxim)
    xi = ein("bchm,hk->bckm", yr, fxim) + ein("bchm,hk->bckm", yi, fxre)
    # per-mode channel mix
    outr, outi = _cmul_mix(xr, xi, wr, wi, "bikm,iokm->bokm")
    # inverse DFT along H
    zr = ein("bokm,kh->bohm", outr, gxre) - ein("bokm,kh->bohm", outi, gxim)
    zi = ein("bokm,kh->bohm", outr, gxim) + ein("bokm,kh->bohm", outi, gxre)
    # inverse rDFT along W, real part
    return ein("bohm,mw->bohw", zr, gyre) + ein("bohm,mw->bohw", zi, gyim)


def spectral_conv2d_fft(x, wr, wi):
    """jnp.fft reference for :func:`spectral_conv2d`."""
    b, _, h, w_len = x.shape
    cout = wr.shape[1]
    m1 = wr.shape[2] // 2
    m2 = wr.shape[3]
    w = (wr + 1j * wi).astype(jnp.complex64)
    xf = jnp.fft.rfft2(x)
    full = jnp.zeros((b, cout, h, w_len // 2 + 1), jnp.complex64)
    top = jnp.einsum("bikm,iokm->bokm", xf[:, :, :m1, :m2], w[:, :, :m1], precision=PRECISION)
    bot = jnp.einsum("bikm,iokm->bokm", xf[:, :, h - m1:, :m2], w[:, :, m1:], precision=PRECISION)
    full = full.at[:, :, :m1, :m2].set(top)
    full = full.at[:, :, h - m1:, :m2].set(bot)
    return jnp.fft.irfft2(full, s=(h, w_len)).astype(x.dtype)


# ---------------------------------------------------------------------------- 3D

def spectral_conv3d(x, wr, wi):
    """x: (B, Cin, D1, D2, D3); wr/wi: (Cin, Cout, 2*m1, 2*m2, m3), the four +/- corner
    blocks stacked as [[w1, w3], [w2, w4]] over (axis2, axis3) halves."""
    d1, d2, d3 = x.shape[-3:]
    m1 = wr.shape[2] // 2
    m2 = wr.shape[3] // 2
    m3 = wr.shape[4]
    fzre, fzim = rdft_forward(d3, m3, x.dtype)
    fyre, fyim = dft_forward_pm(d2, m2, x.dtype)
    fxre, fxim = dft_forward_pm(d1, m1, x.dtype)
    gxre, gxim = dft_inverse_pm(d1, m1, x.dtype)
    gyre, gyim = dft_inverse_pm(d2, m2, x.dtype)
    gzre, gzim = rdft_inverse(d3, m3, x.dtype)

    ein = lambda s, a, b: jnp.einsum(s, a, b, precision=PRECISION)
    zr = ein("bcxyz,zm->bcxym", x, fzre)
    zi = ein("bcxyz,zm->bcxym", x, fzim)
    yr = ein("bcxym,yk->bcxkm", zr, fyre) - ein("bcxym,yk->bcxkm", zi, fyim)
    yi = ein("bcxym,yk->bcxkm", zr, fyim) + ein("bcxym,yk->bcxkm", zi, fyre)
    xr = ein("bcxkm,xj->bcjkm", yr, fxre) - ein("bcxkm,xj->bcjkm", yi, fxim)
    xi = ein("bcxkm,xj->bcjkm", yr, fxim) + ein("bcxkm,xj->bcjkm", yi, fxre)
    outr, outi = _cmul_mix(xr, xi, wr, wi, "bijkm,iojkm->bojkm")
    ar = ein("bojkm,jx->boxkm", outr, gxre) - ein("bojkm,jx->boxkm", outi, gxim)
    ai = ein("bojkm,jx->boxkm", outr, gxim) + ein("bojkm,jx->boxkm", outi, gxre)
    br_ = ein("boxkm,ky->boxym", ar, gyre) - ein("boxkm,ky->boxym", ai, gyim)
    bi_ = ein("boxkm,ky->boxym", ar, gyim) + ein("boxkm,ky->boxym", ai, gyre)
    return ein("boxym,mz->boxyz", br_, gzre) + ein("boxym,mz->boxyz", bi_, gzim)


def spectral_conv3d_fft(x, wr, wi):
    """jnp.fft reference for :func:`spectral_conv3d`."""
    b, _, d1, d2, d3 = x.shape
    cout = wr.shape[1]
    m1 = wr.shape[2] // 2
    m2 = wr.shape[3] // 2
    m3 = wr.shape[4]
    w = (wr + 1j * wi).astype(jnp.complex64)
    xf = jnp.fft.rfftn(x, axes=(-3, -2, -1))
    full = jnp.zeros((b, cout, d1, d2, d3 // 2 + 1), jnp.complex64)
    mix = lambda a, ww: jnp.einsum("bijkm,iojkm->bojkm", a, ww, precision=PRECISION)
    full = full.at[:, :, :m1, :m2, :m3].set(mix(xf[:, :, :m1, :m2, :m3], w[:, :, :m1, :m2]))
    full = full.at[:, :, d1 - m1:, :m2, :m3].set(mix(xf[:, :, d1 - m1:, :m2, :m3], w[:, :, m1:, :m2]))
    full = full.at[:, :, :m1, d2 - m2:, :m3].set(mix(xf[:, :, :m1, d2 - m2:, :m3], w[:, :, :m1, m2:]))
    full = full.at[:, :, d1 - m1:, d2 - m2:, :m3].set(mix(xf[:, :, d1 - m1:, d2 - m2:, :m3], w[:, :, m1:, m2:]))
    return jnp.fft.irfftn(full, s=(d1, d2, d3), axes=(-3, -2, -1)).astype(x.dtype)
