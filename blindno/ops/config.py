"""Runtime selection of the spectral-conv implementation.

Three interchangeable paths, read at trace time (flip before jit-compiling):
- 'jnp' (default)   — XLA-fused truncated-DFT matmul chain.
- 'pallas'          — Pallas spectral-conv kernels (forward only; no AD rule).
- 'pallas_fused'    — fully-fused Pallas FNO *layer* kernels (spectral + pointwise
  residual in one VMEM-resident kernel) with a custom VJP, usable in training
  (:mod:`blindno.ops.fno_layer`). 1D/2D only; 3D always uses 'jnp'.

The default is chosen by measurement: see ``scripts/bench_variants.py`` results in
``runs/logs/bench_variants*.json``.
"""
from __future__ import annotations

import os

_IMPLS = ("jnp", "pallas", "pallas_fused")
_IMPL = os.environ.get("BLINDNO_SPECTRAL_IMPL", "jnp")


def set_spectral_impl(impl: str):
    global _IMPL
    if impl not in _IMPLS:
        raise ValueError(f"unknown spectral impl {impl!r} (want one of {_IMPLS})")
    _IMPL = impl


def spectral_impl() -> str:
    return _IMPL
