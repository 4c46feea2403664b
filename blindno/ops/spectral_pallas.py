"""Pallas TPU kernel: fully-fused FNO layer (spectral conv + pointwise residual + gelu).

One FNO layer is ``y = act(spectral_conv(x) + pointwise(x))``. The jnp path
(:mod:`blindno.ops.spectral`) leaves fusion to XLA; this kernel pins the whole layer in
VMEM per batch element: the activation tile (C, N) or (C, H, W), the truncated DFT
matrices, the mode-mix weights and the pointwise kernel all stay on-chip, so HBM
traffic is exactly one read of x and one write of y per layer. All contractions run on
the MXU via ``jnp.dot``/``jnp.einsum`` with f32 accumulation.

Sizes (width <= 30, padded grids <= 160 / 100x100) give tiles well under the ~16 MB
VMEM budget. Grid = batch.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from blindno.ops.dft import rdft_forward, rdft_inverse, dft_forward_pm, dft_inverse_pm


def _gelu(x):
    return jax.nn.gelu(x, approximate=False)


# ------------------------------------------------------------------ 1D

def _fno1d_layer_kernel(x_ref, fre_ref, fim_ref, gre_ref, gim_ref,
                        wr_ref, wi_ref, pw_ref, pb_ref, out_ref, *, apply_act):
    x = x_ref[0]  # (C, N)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    xr = dot(x, fre_ref[...])  # (C, modes)
    xi = dot(x, fim_ref[...])
    wr = wr_ref[...]  # (Cin, Cout, modes)
    wi = wi_ref[...]
    # per-mode channel mix: out[o,k] = sum_i x[i,k] w[i,o,k]. The per-mode matrices
    # are tiny (<= 30x30), so a batched matmul would waste the 128x128 MXU (and
    # Mosaic's tpu.matmul rejects mismatched batch-dim positions); broadcast-multiply
    # + reduce runs on the VPU instead.
    mix = lambda a, b: (a[:, None, :] * b).sum(axis=0)  # -> (Cout, k)
    outr = mix(xr, wr) - mix(xi, wi)  # (Cout, k)
    outi = mix(xr, wi) + mix(xi, wr)
    spec = dot(outr, gre_ref[...]) + dot(outi, gim_ref[...])  # (Cout, N)
    pw = dot(pw_ref[...].T, x) + pb_ref[...].reshape(-1, 1)  # (Cout, N)
    y = spec + pw
    if apply_act:
        y = _gelu(y)
    out_ref[0] = y


def fno1d_layer_pallas(x, wr, wi, pw_kernel, pw_bias, *, dc_half: bool = True,
                       apply_act: bool = True, interpret: bool = False):
    """x: (B, C, N); wr/wi: (Cin, Cout, modes); pw_kernel: (Cin, Cout); pw_bias: (Cout,).

    Returns act(spectral_conv1d(x) + pointwise(x)) — one FNO1d layer
    (``1d_FPE/FNOModules.py:108-114`` loop body).
    """
    b, c, n = x.shape
    cout = wr.shape[1]
    modes = wr.shape[2]
    fre, fim = rdft_forward(n, modes, x.dtype, dc_half=dc_half)
    gre, gim = rdft_inverse(n, modes, x.dtype)
    kernel = functools.partial(_fno1d_layer_kernel, apply_act=apply_act)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((modes, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((modes, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cout, modes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cout, modes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cout), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout,), lambda i: (0,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, n), x.dtype),
        interpret=interpret,
    )(x, fre, fim, gre, gim, wr, wi, pw_kernel, pw_bias)


# ------------------------------------------------------------------ 2D

def _fno2d_layer_kernel(x_ref, fyre_ref, fyim_ref, fxre_ref, fxim_ref,
                        gxre_ref, gxim_ref, gyre_ref, gyim_ref,
                        wr_ref, wi_ref, pw_ref, pb_ref, out_ref, *, apply_act):
    x = x_ref[0]  # (C, H, W)
    c, h, w = x.shape
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)
    # forward truncated rDFT along W
    yr = ein("chw,wm->chm", x, fyre_ref[...])
    yi = ein("chw,wm->chm", x, fyim_ref[...])
    # +/- block DFT along H
    fxre, fxim = fxre_ref[...], fxim_ref[...]
    xr = ein("chm,hk->ckm", yr, fxre) - ein("chm,hk->ckm", yi, fxim)
    xi = ein("chm,hk->ckm", yr, fxim) + ein("chm,hk->ckm", yi, fxre)
    # per-mode channel mix: out[o,z] = sum_i x[i,z] w[i,o,z] over the collapsed
    # z = k*m mode axis. The per-mode matrices are tiny (width <= 12), so this is
    # VPU work (broadcast-multiply + reduce), not a batched matmul — Mosaic's
    # tpu.matmul also rejects the mismatched batch-dim positions a batched
    # dot_general would need here.
    kk, mm = xr.shape[1], xr.shape[2]
    cout = wr_ref.shape[1]
    wr = wr_ref[...].reshape(c, cout, kk * mm)
    wi = wi_ref[...].reshape(c, cout, kk * mm)
    xr = xr.reshape(c, kk * mm)
    xi = xi.reshape(c, kk * mm)
    mix = lambda a, b: (a[:, None, :] * b).sum(axis=0)  # -> (Cout, z)
    outr = (mix(xr, wr) - mix(xi, wi)).reshape(cout, kk, mm)
    outi = (mix(xr, wi) + mix(xi, wr)).reshape(cout, kk, mm)
    # inverse
    gxre, gxim = gxre_ref[...], gxim_ref[...]
    zr = ein("okm,kh->ohm", outr, gxre) - ein("okm,kh->ohm", outi, gxim)
    zi = ein("okm,kh->ohm", outr, gxim) + ein("okm,kh->ohm", outi, gxre)
    spec = ein("ohm,mw->ohw", zr, gyre_ref[...]) + ein("ohm,mw->ohw", zi, gyim_ref[...])
    pw = ein("io,ihw->ohw", pw_ref[...], x) + pb_ref[...].reshape(-1, 1, 1)
    y = spec + pw
    if apply_act:
        y = _gelu(y)
    out_ref[0] = y


def fno2d_layer_pallas(x, wr, wi, pw_kernel, pw_bias, *, apply_act: bool = True,
                       interpret: bool = False):
    """x: (B, C, H, W); wr/wi: (Cin, Cout, 2*m1, m2). One fused FNO2d layer."""
    b, c, h, w = x.shape
    cout = wr.shape[1]
    m1 = wr.shape[2] // 2
    m2 = wr.shape[3]
    fyre, fyim = rdft_forward(w, m2, x.dtype)
    fxre, fxim = dft_forward_pm(h, m1, x.dtype)
    gxre, gxim = dft_inverse_pm(h, m1, x.dtype)
    gyre, gyim = rdft_inverse(w, m2, x.dtype)
    kernel = functools.partial(_fno2d_layer_kernel, apply_act=apply_act)
    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            full(w, m2), full(w, m2),
            full(h, 2 * m1), full(h, 2 * m1),
            full(2 * m1, h), full(2 * m1, h),
            full(m2, w), full(m2, w),
            full(c, cout, 2 * m1, m2), full(c, cout, 2 * m1, m2),
            full(c, cout), full(cout,),
        ],
        out_specs=pl.BlockSpec((1, cout, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, w), x.dtype),
        interpret=interpret,
    )(x, fyre, fyim, fxre, fxim, gxre, gxim, gyre, gyim, wr, wi, pw_kernel, pw_bias)


# ------------------------------------------------------------------ spectral-only kernels
# (same VMEM-resident DFT chain without the pointwise/act epilogue; drop-in for
# ops.spectral.spectral_conv{1,2}d so the flax param tree is unchanged)

def spectral_conv1d_pallas(x, wr, wi, dc_half: bool = True, interpret: bool = False):
    b, c, n = x.shape
    cout = wr.shape[1]
    modes = wr.shape[2]
    fre, fim = rdft_forward(n, modes, x.dtype, dc_half=dc_half)
    gre, gim = rdft_inverse(n, modes, x.dtype)

    def kernel(x_ref, fre_ref, fim_ref, gre_ref, gim_ref, wr_ref, wi_ref, out_ref):
        xx = x_ref[0]
        dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
        xr = dot(xx, fre_ref[...])
        xi = dot(xx, fim_ref[...])
        # VPU per-mode channel mix; see _fno1d_layer_kernel
        mix = lambda a, b: (a[:, None, :] * b).sum(axis=0)
        outr = mix(xr, wr_ref[...]) - mix(xi, wi_ref[...])
        outi = mix(xr, wi_ref[...]) + mix(xi, wr_ref[...])
        out_ref[0] = dot(outr, gre_ref[...]) + dot(outi, gim_ref[...])

    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n, modes), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((modes, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((modes, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cout, modes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, cout, modes), lambda i: (0, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, n), x.dtype),
        interpret=interpret,
    )(x, fre, fim, gre, gim, wr, wi)


def spectral_conv2d_pallas(x, wr, wi, interpret: bool = False):
    b, c, h, w = x.shape
    cout = wr.shape[1]
    m1 = wr.shape[2] // 2
    m2 = wr.shape[3]
    fyre, fyim = rdft_forward(w, m2, x.dtype)
    fxre, fxim = dft_forward_pm(h, m1, x.dtype)
    gxre, gxim = dft_inverse_pm(h, m1, x.dtype)
    gyre, gyim = rdft_inverse(w, m2, x.dtype)

    def kernel(x_ref, fyre_ref, fyim_ref, fxre_ref, fxim_ref,
               gxre_ref, gxim_ref, gyre_ref, gyim_ref, wr_ref, wi_ref, out_ref):
        xx = x_ref[0]
        cc = xx.shape[0]
        ein = functools.partial(jnp.einsum, preferred_element_type=jnp.float32)
        yr = ein("chw,wm->chm", xx, fyre_ref[...])
        yi = ein("chw,wm->chm", xx, fyim_ref[...])
        fxre_, fxim_ = fxre_ref[...], fxim_ref[...]
        xr = ein("chm,hk->ckm", yr, fxre_) - ein("chm,hk->ckm", yi, fxim_)
        xi = ein("chm,hk->ckm", yr, fxim_) + ein("chm,hk->ckm", yi, fxre_)
        # VPU per-mode channel mix over the collapsed z = k*m mode axis;
        # see _fno2d_layer_kernel
        kk, mm = xr.shape[1], xr.shape[2]
        co = wr_ref.shape[1]
        wr_ = wr_ref[...].reshape(cc, co, kk * mm)
        wi_ = wi_ref[...].reshape(cc, co, kk * mm)
        xr = xr.reshape(cc, kk * mm)
        xi = xi.reshape(cc, kk * mm)
        mix = lambda a, b: (a[:, None, :] * b).sum(axis=0)
        outr = (mix(xr, wr_) - mix(xi, wi_)).reshape(co, kk, mm)
        outi = (mix(xr, wi_) + mix(xi, wr_)).reshape(co, kk, mm)
        gxre_, gxim_ = gxre_ref[...], gxim_ref[...]
        zr = ein("okm,kh->ohm", outr, gxre_) - ein("okm,kh->ohm", outi, gxim_)
        zi = ein("okm,kh->ohm", outr, gxim_) + ein("okm,kh->ohm", outi, gxre_)
        out_ref[0] = ein("ohm,mw->ohw", zr, gyre_ref[...]) + ein("ohm,mw->ohw", zi, gyim_ref[...])

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            full(w, m2), full(w, m2),
            full(h, 2 * m1), full(h, 2 * m1),
            full(2 * m1, h), full(2 * m1, h),
            full(m2, w), full(m2, w),
            full(c, cout, 2 * m1, m2), full(c, cout, 2 * m1, m2),
        ],
        out_specs=pl.BlockSpec((1, cout, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, w), x.dtype),
        interpret=interpret,
    )(x, fyre, fyim, fxre, fxim, gxre, gxim, gyre, gyim, wr, wi)
