"""CNN snapshot encoders (OpenFWI-style) re-designed channel-last for TPU.

Re-design of ``/root/reference/1d_FPE/Baselines.py`` (per-suite copies differ only in the
final kernel sizes that collapse the grid to 1 point — here those are explicit
parameters). The reference processes 1-D snapshots as (B*L, 1, 1, N) 2-D convs with
(1, k) kernels; we use true 1-D convs in NWC layout — identical math, TPU-native layout.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from blindno.nn.torch_layers import (
    TorchConv,
    TorchConvTranspose,
    TorchBatchNorm,
    TorchDense,
    leaky_relu,
)


class ConvBlock(nn.Module):
    """Conv + norm + LeakyReLU(0.2) (``Baselines.py:40-52``). Channel-last, any ndim."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Sequence[int] | int = 1
    norm: str = "bn"
    relu_slope: float = 0.2

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = TorchConv(self.features, self.kernel_size, self.strides, self.padding)(x)
        if self.norm == "bn":
            x = TorchBatchNorm(use_running_average=not training)(x)
        elif self.norm == "ln":
            x = nn.LayerNorm()(x)
        elif self.norm == "in":
            # InstanceNorm: normalize over spatial axes per sample/channel
            axes = tuple(range(1, x.ndim - 1))
            mean = x.mean(axes, keepdims=True)
            var = x.var(axes, keepdims=True)
            x = (x - mean) / jnp.sqrt(var + 1e-5)
        return leaky_relu(x, self.relu_slope)


class ConvBlockTanh(nn.Module):
    """Conv + norm + Tanh (``Baselines.py:55-65``)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Sequence[int] | int = 1

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = TorchConv(self.features, self.kernel_size, self.strides, self.padding)(x)
        x = TorchBatchNorm(use_running_average=not training)(x)
        return jnp.tanh(x)


class DeconvBlock(nn.Module):
    """ConvTranspose + BN + LeakyReLU(0.2) (``Baselines.py:68-78``)."""

    features: int
    kernel_size: Sequence[int] = (2, 2)
    strides: Sequence[int] = (2, 2)
    output_padding: Sequence[int] | int = 0

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        x = TorchConvTranspose(self.features, self.kernel_size, self.strides, self.output_padding)(x)
        x = TorchBatchNorm(use_running_average=not training)(x)
        return leaky_relu(x, 0.2)


class ResizeBlock(nn.Module):
    """Nearest-upsample + Conv + BN + LeakyReLU (``Baselines.py:81-92``)."""

    features: int
    scale_factor: int = 2

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        # nearest-neighbor upsample on all spatial dims
        for ax in range(1, x.ndim - 1):
            x = jnp.repeat(x, self.scale_factor, axis=ax)
        x = TorchConv(self.features, (3,) * (x.ndim - 2), None, 1)(x)
        x = TorchBatchNorm(use_running_average=not training)(x)
        return leaky_relu(x, 0.2)


class Encoder1D(nn.Module):
    """Per-snapshot 1-D CNN branch encoder (``Baselines.py:254-287``).

    Input (B, L, N) -> features (B, L, output_dim). Three stride-2 ConvBlocks then
    ``final_convs`` = ((kernel, padding), ...) chosen so the grid collapses to 1:
    - 1D FPE, N=80:  ((5, 1), (5, 0), (4, 0))      [``1d_FPE/Baselines.py:260-263``]
    - 1D GPE, N=128: ((5, 1), (5, 0), (7, 0), (4, 0)) [``1d_GPE/Baselines.py:260-264``]
    """

    output_dim: int
    final_convs: Tuple[Tuple[int, int], ...] = ((5, 1), (5, 0), (4, 0))
    dim1: int = 64
    dim2: int = 128
    dim3: int = 256

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, l, n = x.shape
        h = x.reshape(b * l, n, 1)
        for dim in (self.dim1, self.dim2, self.dim3):
            h = ConvBlock(dim, (3,), (2,), 1)(h, training=training)
        for k, p in self.final_convs:
            h = ConvBlock(self.dim3, (k,), (1,), p)(h, training=training)
        h = h.reshape(b, l, -1)
        if h.shape[-1] != self.dim3:
            raise ValueError(f"Encoder1D did not collapse the grid: got {h.shape[-1]} features")
        return TorchDense(self.output_dim)(h)


class Encoder2D(nn.Module):
    """Per-snapshot 2-D CNN branch encoder (``2d_FPE/Baselines.py:186-249``).

    Input (B, L, H, W) -> (B, L, n_out). ``final_kernel`` collapses the last map to 1x1:
    (2, 1) for 61x61 (2D FPE), (3, 2) for 80x80 (2D NC FPE).
    """

    n_out: int
    final_kernel: Tuple[int, int] = (2, 1)
    dim1: int = 64
    dim2: int = 128
    dim3: int = 256
    dim4: int = 512
    dim5: int = 512

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, l, hh, ww = x.shape
        h = x.reshape(b * l, hh, ww, 1)
        h = ConvBlock(self.dim1, (1, 7), (1, 2), (0, 3))(h, training=training)
        h = ConvBlock(self.dim2, (3, 3), (2, 2), (1, 1))(h, training=training)
        h = ConvBlock(self.dim2, (3, 3), (1, 1), (1, 1))(h, training=training)
        h = ConvBlock(self.dim3, (3, 3), (2, 2), (1, 1))(h, training=training)
        h = ConvBlock(self.dim3, (3, 3), (1, 1), (1, 1))(h, training=training)
        h = ConvBlock(self.dim4, (3, 3), (2, 2), (1, 1))(h, training=training)
        h = ConvBlock(self.dim4, (3, 3), (1, 1), (1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (3, 3), (2, 2), (1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (3, 3), (2, 2), (1, 1))(h, training=training)
        h = ConvBlock(self.dim5, self.final_kernel, (1, 1), 0)(h, training=training)
        h = h.reshape(b, l, -1)
        if h.shape[-1] != self.dim5:
            raise ValueError(f"Encoder2D did not collapse the grid: got {h.shape[-1]} features")
        return TorchDense(self.n_out)(h)


class Encoder3D(nn.Module):
    """3-D conv encoder for volumetric snapshot sets (``Baselines.py:322-…``; vestigial
    in the reference — paired with the absent protein suite — kept for inventory parity).

    Input (B, L, D, H, W) -> (B, L, n_out). Kernel schedule collapses 40^3 to 1.
    """

    n_out: int
    dim1: int = 64
    dim2: int = 128
    dim3: int = 256
    dim4: int = 512
    dim5: int = 512

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, l, d, hh, ww = x.shape
        h = x.reshape(b * l, d, hh, ww, 1)
        h = ConvBlock(self.dim1, (1, 7, 7), (1, 2, 2), (0, 3, 3))(h, training=training)
        h = ConvBlock(self.dim2, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim2, (3, 3, 3), (1, 1, 1), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim3, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim3, (3, 3, 3), (1, 1, 1), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim4, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim4, (3, 3, 3), (1, 1, 1), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (2, 1, 1), (1, 1, 1), 0)(h, training=training)
        h = h.reshape(b, l, -1)
        return TorchDense(self.n_out)(h)


class EncoderHelm2(nn.Module):
    """Helmholtz-era 2-D encoder variant (``Baselines.py:95-147``; unused in the main
    path, kept for inventory parity). Input (B, L, H, W) with H tiny (e.g. 2)."""

    n_out: int
    dim1: int = 64
    dim2: int = 128
    dim5: int = 512

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, l = x.shape[:2]
        h = x.reshape((b * l,) + x.shape[2:] + (1,))
        h = ConvBlock(self.dim1, (1, 7), (1, 2), (0, 3))(h, training=training)
        h = ConvBlock(self.dim2, (1, 3), (1, 2), (0, 1))(h, training=training)
        h = ConvBlock(self.dim5, (1, 3), (1, 2), (0, 1))(h, training=training)
        h = ConvBlock(self.dim5, (1, 3), (1, 2), (0, 1))(h, training=training)
        h = ConvBlock(self.dim5, (2, 4), (1, 1), 0)(h, training=training)
        h = h.reshape(b, l, -1)
        return TorchDense(self.n_out)(h)


class EncoderODE(nn.Module):
    """ODE-observation encoder variant (``Baselines.py:290-320``; vestigial)."""

    output_dim: int
    dim1: int = 64
    dim2: int = 128
    dim3: int = 256

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, l, n = x.shape
        h = x.reshape(b * l, n, 1)
        for dim in (self.dim1, self.dim2, self.dim3):
            h = ConvBlock(dim, (3,), (2,), 1)(h, training=training)
        h = ConvBlock(self.dim3, (3,), (1,), 1)(h, training=training)
        h = ConvBlock(self.dim3, (2,), (1,), 0)(h, training=training)
        h = h.reshape(b, l, -1)
        return TorchDense(self.output_dim)(h)


class Encoder3DDown(nn.Module):
    """Deeper-downsampling 3-D encoder (``Baselines.py:360-430``; vestigial)."""

    n_out: int
    dim1: int = 64
    dim2: int = 128
    dim3: int = 256
    dim4: int = 512
    dim5: int = 512

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, l = x.shape[:2]
        h = x.reshape((b * l,) + x.shape[2:] + (1,))
        h = ConvBlock(self.dim1, (1, 7, 7), (1, 2, 2), (0, 3, 3))(h, training=training)
        h = ConvBlock(self.dim2, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim2, (3, 3, 3), (1, 1, 1), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim3, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim3, (3, 3, 3), (1, 1, 1), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim4, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim4, (3, 3, 3), (1, 1, 1), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (3, 3, 3), (2, 2, 2), (1, 1, 1))(h, training=training)
        h = ConvBlock(self.dim5, (1, 1, 1), (1, 1, 1), 0)(h, training=training)
        h = h.reshape(b, l, -1)
        return TorchDense(self.n_out)(h)
