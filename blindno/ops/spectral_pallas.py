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

def _mix1d(xr, xi, wr_ref, wi_ref):
    """Per-mode channel mix out[o,k] = sum_i x[i,k] w[i,o,k] in strictly-2D tiles.

    The per-mode matrices are tiny (<= 30x30), so this is VPU work; a batched matmul
    would waste the 128x128 MXU, and Mosaic rejects both the mismatched-batch-dim
    dot_general and reshapes/broadcasts that touch the minor (lane) dim. Unrolled
    multiply-accumulate over Cin with row-broadcast (1, modes) factors lowers cleanly.
    """
    c = xr.shape[0]
    outr = outi = None
    for i in range(c):
        xri = xr[i][None, :]  # (1, modes)
        xii = xi[i][None, :]
        wri = wr_ref[i]  # (Cout, modes)
        wii = wi_ref[i]
        pr = wri * xri - wii * xii
        pi = wii * xri + wri * xii
        outr = pr if outr is None else outr + pr
        outi = pi if outi is None else outi + pi
    return outr, outi


def _fno1d_layer_kernel(x_ref, fre_ref, fim_ref, gre_ref, gim_ref,
                        wr_ref, wi_ref, pw_ref, pb_ref, out_ref, *, apply_act):
    x = x_ref[0]  # (C, N)
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    xr = dot(x, fre_ref[...])  # (C, modes)
    xi = dot(x, fim_ref[...])
    outr, outi = _mix1d(xr, xi, wr_ref, wi_ref)  # (Cout, modes)
    spec = dot(outr, gre_ref[...]) + dot(outi, gim_ref[...])  # (Cout, N)
    # pw_ref holds the pre-transposed (Cout, Cin) kernel, pb_ref a (Cout, 1) column
    pw = dot(pw_ref[...], x) + pb_ref[...]  # (Cout, N)
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
            pl.BlockSpec((cout, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((cout, 1), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, cout, n), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, n), x.dtype),
        interpret=interpret,
    )(x, fre, fim, gre, gim, wr, wi, pw_kernel.T, pw_bias.reshape(-1, 1))


# ------------------------------------------------------------------ 2D
#
# Mosaic constraints shape the 2-D kernels: reshapes/broadcasts touching the minor
# (lane) dims do not lower ("unsupported shape cast" on e.g. (76,12,32)->(76,384)),
# and batched tpu.matmul requires matching batch-dim positions. So the whole chain is
# expressed in strictly 2-D tiles: an unrolled per-channel loop of plain matmuls for
# the separable DFTs, and an unrolled (Cin x Cout) multiply-accumulate for the
# per-mode channel mix (the per-mode matrices are <= 12x12 — VPU work either way).
# Channel counts are <= 12 here, so the unroll stays small.


def _spec2d_chain(x_ref, fyre_ref, fyim_ref, fxre_t_ref, fxim_t_ref,
                  gxre_t_ref, gxim_t_ref, gyre_ref, gyim_ref, wr_ref, wi_ref):
    """Strictly-2D spectral conv chain for one batch element.

    x_ref block: (1, C, H, W); fy*: (W, m2); fx*_t: (K, H); gx*_t: (H, K);
    gy*: (m2, W); w*: (C, Cout, K, m2) with K = 2*m1. Returns a list of Cout
    (H, W) tiles.
    """
    c = x_ref.shape[1]
    cout = wr_ref.shape[1]
    dot = functools.partial(jnp.dot, preferred_element_type=jnp.float32)
    fyre, fyim = fyre_ref[...], fyim_ref[...]
    fxre_t, fxim_t = fxre_t_ref[...], fxim_t_ref[...]
    yr = [dot(x_ref[0, i], fyre) for i in range(c)]  # (H, m2) each
    yi = [dot(x_ref[0, i], fyim) for i in range(c)]
    xr = [dot(fxre_t, yr[i]) - dot(fxim_t, yi[i]) for i in range(c)]  # (K, m2)
    xi = [dot(fxim_t, yr[i]) + dot(fxre_t, yi[i]) for i in range(c)]
    gxre_t, gxim_t = gxre_t_ref[...], gxim_t_ref[...]
    gyre, gyim = gyre_ref[...], gyim_ref[...]
    outs = []
    for o in range(cout):
        outr = outi = None
        for i in range(c):
            wr_io = wr_ref[i, o]  # (K, m2)
            wi_io = wi_ref[i, o]
            pr = xr[i] * wr_io - xi[i] * wi_io
            pi = xr[i] * wi_io + xi[i] * wr_io
            outr = pr if outr is None else outr + pr
            outi = pi if outi is None else outi + pi
        zr = dot(gxre_t, outr) - dot(gxim_t, outi)  # (H, m2)
        zi = dot(gxim_t, outr) + dot(gxre_t, outi)
        outs.append(dot(zr, gyre) + dot(zi, gyim))  # (H, W)
    return outs


def _fno2d_layer_kernel(x_ref, fyre_ref, fyim_ref, fxre_t_ref, fxim_t_ref,
                        gxre_t_ref, gxim_t_ref, gyre_ref, gyim_ref,
                        wr_ref, wi_ref, pw_ref, pb_ref, out_ref, *, apply_act):
    spec = _spec2d_chain(x_ref, fyre_ref, fyim_ref, fxre_t_ref, fxim_t_ref,
                         gxre_t_ref, gxim_t_ref, gyre_ref, gyim_ref, wr_ref, wi_ref)
    c = x_ref.shape[1]
    for o in range(len(spec)):
        pw = None
        for i in range(c):
            term = x_ref[0, i] * pw_ref[i, o]
            pw = term if pw is None else pw + term
        y = spec[o] + pw + pb_ref[o, 0]
        if apply_act:
            y = _gelu(y)
        out_ref[0, o] = y


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
            full(2 * m1, h), full(2 * m1, h),
            full(h, 2 * m1), full(h, 2 * m1),
            full(m2, w), full(m2, w),
            full(c, cout, 2 * m1, m2), full(c, cout, 2 * m1, m2),
            full(c, cout), full(cout, 1),
        ],
        out_specs=pl.BlockSpec((1, cout, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, w), x.dtype),
        interpret=interpret,
    )(x, fyre, fyim, fxre.T, fxim.T, gxre.T, gxim.T, gyre, gyim, wr, wi,
      pw_kernel, pw_bias.reshape(-1, 1))


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
        outr, outi = _mix1d(xr, xi, wr_ref, wi_ref)
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

    def kernel(x_ref, fyre_ref, fyim_ref, fxre_t_ref, fxim_t_ref,
               gxre_t_ref, gxim_t_ref, gyre_ref, gyim_ref, wr_ref, wi_ref, out_ref):
        spec = _spec2d_chain(x_ref, fyre_ref, fyim_ref, fxre_t_ref, fxim_t_ref,
                             gxre_t_ref, gxim_t_ref, gyre_ref, gyim_ref, wr_ref, wi_ref)
        for o in range(len(spec)):
            out_ref[0, o] = spec[o]

    full = lambda *shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape), memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, c, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
            full(w, m2), full(w, m2),
            full(2 * m1, h), full(2 * m1, h),
            full(h, 2 * m1), full(h, 2 * m1),
            full(m2, w), full(m2, w),
            full(c, cout, 2 * m1, m2), full(c, cout, 2 * m1, m2),
        ],
        out_specs=pl.BlockSpec((1, cout, h, w), lambda i: (i, 0, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, cout, h, w), x.dtype),
        interpret=interpret,
    )(x, fyre, fyim, fxre.T, fxim.T, gxre.T, gxim.T, gyre, gyim, wr, wi)
