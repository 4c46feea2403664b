"""Fused FNO layer (spectral conv + pointwise residual + gelu) with training support.

Forward runs the fully-fused Pallas kernel (:mod:`blindno.ops.spectral_pallas`), which
keeps the activation tile and all DFT/mix/pointwise constants VMEM-resident — one HBM
read of x and one write of u per layer. The backward pass is a hand-written transpose
of the truncated-DFT matmul chain in plain einsums (XLA fuses those as well as it fuses
the jnp forward), registered via ``jax.custom_vjp`` because ``pallas_call`` defines no
AD rule.

The activation is applied OUTSIDE the custom-vjp boundary (its gradient needs the
pre-activation ``u``, which would otherwise have to be a second kernel output), so the
linear part carries the custom VJP and gelu differentiates natively.

Reference semantics: one loop body of ``1d_FPE/FNOModules.py:108-114`` /
``:205-217`` — ``act(spectral_conv(x) + conv1x1(x))``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from blindno.ops.dft import rdft_forward, rdft_inverse, dft_forward_pm, dft_inverse_pm
from blindno.ops.spectral_pallas import fno1d_layer_pallas, fno2d_layer_pallas

PRECISION = lax.Precision.HIGHEST


def _ein(s, a, b):
    return jnp.einsum(s, a, b, precision=PRECISION)


# ------------------------------------------------------------------ 1D

@functools.lru_cache(maxsize=None)
def _linear1d(dc_half: bool, interpret: bool):
    @jax.custom_vjp
    def f(x, wr, wi, pk, pb):
        return fno1d_layer_pallas(x, wr, wi, pk, pb, dc_half=dc_half,
                                  apply_act=False, interpret=interpret)

    def fwd(x, wr, wi, pk, pb):
        return f(x, wr, wi, pk, pb), (x, wr, wi, pk)

    def bwd(res, du):
        # u = (x F) (.) W @ G + pk^T x + pb, all matrices real planes; transpose chain.
        x, wr, wi, pk = res
        n = x.shape[-1]
        modes = wr.shape[-1]
        dtype = x.dtype
        fre, fim = rdft_forward(n, modes, dtype, dc_half=dc_half)
        gre, gim = rdft_inverse(n, modes, dtype)
        d_or = _ein("bon,kn->bok", du, gre)
        d_oi = _ein("bon,kn->bok", du, gim)
        dxr = _ein("bok,iok->bik", d_or, wr) + _ein("bok,iok->bik", d_oi, wi)
        dxi = _ein("bok,iok->bik", d_oi, wr) - _ein("bok,iok->bik", d_or, wi)
        dx = (_ein("bik,nk->bin", dxr, fre) + _ein("bik,nk->bin", dxi, fim)
              + _ein("bon,io->bin", du, pk))
        xr = _ein("bcn,nk->bck", x, fre)
        xi = _ein("bcn,nk->bck", x, fim)
        dwr = _ein("bik,bok->iok", xr, d_or) + _ein("bik,bok->iok", xi, d_oi)
        dwi = _ein("bik,bok->iok", xr, d_oi) - _ein("bik,bok->iok", xi, d_or)
        dpk = _ein("bin,bon->io", x, du)
        dpb = du.sum(axis=(0, 2))
        return dx, dwr, dwi, dpk, dpb

    f.defvjp(fwd, bwd)
    return f


def _interp(interpret: bool) -> bool:
    """Pallas TPU kernels run in interpret mode on CPU (tests / virtual meshes)."""
    return interpret or jax.default_backend() != "tpu"


def fno1d_layer(x, wr, wi, pk, pb, *, dc_half: bool = True, apply_act: bool = True,
                interpret: bool = False):
    """One fused FNO1d layer. x: (B, C, N); wr/wi: (Cin, Cout, modes);
    pk: (Cin, Cout); pb: (Cout,). Differentiable (custom VJP)."""
    u = _linear1d(dc_half, _interp(interpret))(x, wr, wi, pk, pb)
    return jax.nn.gelu(u, approximate=False) if apply_act else u


# ------------------------------------------------------------------ 2D

@functools.lru_cache(maxsize=None)
def _linear2d(interpret: bool):
    @jax.custom_vjp
    def f(x, wr, wi, pk, pb):
        return fno2d_layer_pallas(x, wr, wi, pk, pb, apply_act=False,
                                  interpret=interpret)

    def fwd(x, wr, wi, pk, pb):
        return f(x, wr, wi, pk, pb), (x, wr, wi, pk)

    def bwd(res, du):
        x, wr, wi, pk = res
        h, w = x.shape[-2], x.shape[-1]
        m1 = wr.shape[2] // 2
        m2 = wr.shape[3]
        dtype = x.dtype
        fyre, fyim = rdft_forward(w, m2, dtype)
        fxre, fxim = dft_forward_pm(h, m1, dtype)
        gxre, gxim = dft_inverse_pm(h, m1, dtype)
        gyre, gyim = rdft_inverse(w, m2, dtype)
        # inverse rDFT along W: s = zr gyre + zi gyim
        d_zr = _ein("bohw,mw->bohm", du, gyre)
        d_zi = _ein("bohw,mw->bohm", du, gyim)
        # inverse +/- DFT along H: zr = or gxre - oi gxim; zi = or gxim + oi gxre
        d_or = _ein("bohm,kh->bokm", d_zr, gxre) + _ein("bohm,kh->bokm", d_zi, gxim)
        d_oi = _ein("bohm,kh->bokm", d_zi, gxre) - _ein("bohm,kh->bokm", d_zr, gxim)
        # channel mix: or = xr wr - xi wi; oi = xr wi + xi wr
        d_xr = _ein("bokm,iokm->bikm", d_or, wr) + _ein("bokm,iokm->bikm", d_oi, wi)
        d_xi = _ein("bokm,iokm->bikm", d_oi, wr) - _ein("bokm,iokm->bikm", d_or, wi)
        # forward +/- DFT along H: xr = yr fxre - yi fxim; xi = yr fxim + yi fxre
        d_yr = _ein("bckm,hk->bchm", d_xr, fxre) + _ein("bckm,hk->bchm", d_xi, fxim)
        d_yi = _ein("bckm,hk->bchm", d_xi, fxre) - _ein("bckm,hk->bchm", d_xr, fxim)
        # forward rDFT along W (real input): yr = x fyre; yi = x fyim
        dx = (_ein("bchm,wm->bchw", d_yr, fyre) + _ein("bchm,wm->bchw", d_yi, fyim)
              + _ein("bohw,io->bihw", du, pk))
        # weight grads need the forward spectrum; recompute (4 small matmuls)
        yr = _ein("bchw,wm->bchm", x, fyre)
        yi = _ein("bchw,wm->bchm", x, fyim)
        xr = _ein("bchm,hk->bckm", yr, fxre) - _ein("bchm,hk->bckm", yi, fxim)
        xi = _ein("bchm,hk->bckm", yr, fxim) + _ein("bchm,hk->bckm", yi, fxre)
        dwr = _ein("bikm,bokm->iokm", xr, d_or) + _ein("bikm,bokm->iokm", xi, d_oi)
        dwi = _ein("bikm,bokm->iokm", xr, d_oi) - _ein("bikm,bokm->iokm", xi, d_or)
        dpk = _ein("bihw,bohw->io", x, du)
        dpb = du.sum(axis=(0, 2, 3))
        return dx, dwr, dwi, dpk, dpb

    f.defvjp(fwd, bwd)
    return f


def fno2d_layer(x, wr, wi, pk, pb, *, apply_act: bool = True, interpret: bool = False):
    """One fused FNO2d layer. x: (B, C, H, W); wr/wi: (Cin, Cout, 2*m1, m2);
    pk: (Cin, Cout); pb: (Cout,). Differentiable (custom VJP)."""
    u = _linear2d(_interp(interpret))(x, wr, wi, pk, pb)
    return jax.nn.gelu(u, approximate=False) if apply_act else u
