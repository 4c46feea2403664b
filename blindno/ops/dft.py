"""Truncated DFT matrices for MXU-resident spectral convolutions.

TPU-first design note
---------------------
The reference implements Fourier layers as ``rfft -> zero-padded mode-truncated complex
einsum -> irfft`` (``/root/reference/1d_FPE/FNOModules.py:47-59,146-161``). On TPU, for the
tiny grids this problem family uses (N <= 160 after domain padding), an FFT is the *wrong*
primitive: XLA's small-batch FFTs run on the VPU, while an N x M matmul runs on the 128x128
MXU systolic array at full rate. Because the FNO keeps only ``modes << N`` frequencies, the
forward transform only ever needs the first ``modes`` columns of the DFT matrix and the
inverse only needs those same rows — so the whole spectral layer collapses into a chain of
small dense matmuls with *no* zero-padding, no scatter into a full spectrum, and no complex
dtype (we carry explicit real/imag planes, which keeps optimizer states real and maps
cleanly onto bf16/fp32 MXU tiles).

All matrices are built once in float64 numpy at trace time and closed over as constants.
"""
from __future__ import annotations

import numpy as np
import jax.numpy as jnp

__all__ = [
    "rdft_forward",
    "rdft_inverse",
    "dft_forward_pm",
    "dft_inverse_pm",
]


def rdft_forward(n: int, modes: int, dtype=jnp.float32, dc_half: bool = False):
    """Real-input truncated DFT: ``X_k = sum_j x_j e^{-2 pi i j k / n}`` for k < modes.

    Returns ``(fre, fim)`` of shape ``(n, modes)`` so that ``x @ fre + i * (x @ fim)``
    equals ``rfft(x)[..., :modes]``.

    ``dc_half`` folds in the reference's 1-D quirk of halving the DC coefficient before
    the mode mix (``1d_FPE/FNOModules.py:51``).
    """
    if modes > n // 2 + 1:
        raise ValueError(f"modes={modes} exceeds n//2+1={n // 2 + 1} for n={n}")
    j = np.arange(n)[:, None]
    k = np.arange(modes)[None, :]
    ang = 2.0 * np.pi * j * k / n
    fre = np.cos(ang)
    fim = -np.sin(ang)
    if dc_half:
        fre[:, 0] *= 0.5  # imag part of the DC column is identically zero
    return jnp.asarray(fre, dtype), jnp.asarray(fim, dtype)


def rdft_inverse(n: int, modes: int, dtype=jnp.float32):
    """Inverse of a mode-truncated rfft: ``y = Xr @ gre + Xi @ gim``.

    Matches ``irfft(pad_to_full(X), n)`` where all coefficients >= ``modes`` are zero:
    ``y_j = (1/n) * sum_k c_k Re[X_k e^{+2 pi i j k / n}]`` with ``c_0 = 1``,
    ``c_k = 2`` for interior k, and ``c_{n/2} = 1`` if the Nyquist mode is kept.
    Shapes: ``(modes, n)``.
    """
    if modes > n // 2 + 1:
        raise ValueError(f"modes={modes} exceeds n//2+1={n // 2 + 1} for n={n}")
    k = np.arange(modes)[:, None]
    j = np.arange(n)[None, :]
    ang = 2.0 * np.pi * j * k / n
    coef = np.full((modes, 1), 2.0)
    coef[0] = 1.0
    if n % 2 == 0 and modes == n // 2 + 1:
        coef[-1] = 1.0
    gre = coef * np.cos(ang) / n
    gim = -coef * np.sin(ang) / n
    return jnp.asarray(gre, dtype), jnp.asarray(gim, dtype)


def dft_forward_pm(n: int, modes: int, dtype=jnp.float32):
    """Full complex DFT restricted to the ``2*modes`` rows FNO2d/3d keeps: frequencies
    ``[0..modes-1]`` and ``[n-modes..n-1]`` (the +/- corner blocks,
    ``1d_FPE/FNOModules.py:154-157``). Returns ``(fre, fim)`` of shape ``(n, 2*modes)``.

    Applied to a complex signal ``z = zr + i zi`` along an axis of length n:
    ``Z = (zr @ fre - zi @ fim) + i (zr @ fim + zi @ fre)``.
    """
    if 2 * modes > n:
        raise ValueError(f"2*modes={2 * modes} exceeds n={n}: +/- mode blocks overlap")
    freqs = np.concatenate([np.arange(modes), np.arange(n - modes, n)])
    j = np.arange(n)[:, None]
    ang = 2.0 * np.pi * j * freqs[None, :] / n
    return jnp.asarray(np.cos(ang), dtype), jnp.asarray(-np.sin(ang), dtype)


def dft_inverse_pm(n: int, modes: int, dtype=jnp.float32):
    """Inverse full DFT from the ``2*modes`` +/- frequency rows back to n points,
    all other frequencies zero: ``z_j = (1/n) sum_k Z_k e^{+2 pi i j k / n}``.
    Returns ``(gre, gim)`` of shape ``(2*modes, n)``; complex-multiply as in
    :func:`dft_forward_pm`.
    """
    if 2 * modes > n:
        raise ValueError(f"2*modes={2 * modes} exceeds n={n}: +/- mode blocks overlap")
    freqs = np.concatenate([np.arange(modes), np.arange(n - modes, n)])
    j = np.arange(n)[None, :]
    ang = 2.0 * np.pi * freqs[:, None] * j / n
    gre = np.cos(ang) / n
    gim = np.sin(ang) / n
    return jnp.asarray(gre, dtype), jnp.asarray(gim, dtype)
