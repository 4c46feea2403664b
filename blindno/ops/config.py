"""Runtime selection of the spectral-conv implementation.

``set_spectral_impl('pallas')`` routes all SpectralConv modules through the fused
Pallas TPU kernels; 'jnp' (default) uses the XLA-fused truncated-DFT matmul path.
Read at trace time, so flip it before jit-compiling.
"""
from __future__ import annotations

import os

_IMPL = os.environ.get("BLINDNO_SPECTRAL_IMPL", "jnp")


def set_spectral_impl(impl: str):
    global _IMPL
    if impl not in ("jnp", "pallas"):
        raise ValueError(f"unknown spectral impl {impl!r} (want 'jnp' or 'pallas')")
    _IMPL = impl


def spectral_impl() -> str:
    return _IMPL
