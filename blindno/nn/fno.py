"""Fourier Neural Operator stacks (1D/2D/3D), TPU-native.

Re-design of the reference's ``FNOModules.py`` (``/root/reference/1d_FPE/FNOModules.py``,
byte-identical across suites): lift -> n x (spectral conv + 1x1 conv residual, gelu) ->
project, with 1/4 domain padding. Differences from the reference are layout only
(channel-last activations; spectral weights as real/imag planes); the math is identical,
including the 1-D DC-halving quirk and the torch-default/``scale * U[0,1)`` inits.

The spectral kernels run as truncated-DFT matmul chains on the MXU
(:mod:`blindno.ops.spectral`).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from blindno.ops import spectral
from blindno.ops.config import spectral_impl
from blindno.nn.torch_layers import TorchDense, gelu
from blindno.utils import torch_init as tinit


class SpectralConv1d(nn.Module):
    """Mode-truncated 1D Fourier layer (``1d_FPE/FNOModules.py:27-59``). (B, C, N) -> (B, C', N)."""

    in_channels: int
    out_channels: int
    modes: int
    dc_half: bool = True

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, self.modes)
        wr = self.param("weights_re", tinit.spectral_uniform(scale), shape)
        wi = self.param("weights_im", tinit.spectral_uniform(scale), shape)
        if return_weights:  # fused-layer path: parent consumes the params directly
            return wr, wi
        if spectral_impl() == "pallas":
            from blindno.ops.spectral_pallas import spectral_conv1d_pallas

            return spectral_conv1d_pallas(x, wr, wi, dc_half=self.dc_half)
        return spectral.spectral_conv1d(x, wr, wi, dc_half=self.dc_half)


class SpectralConv2d(nn.Module):
    """2D Fourier layer with +/- row blocks (``1d_FPE/FNOModules.py:124-161``)."""

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int

    @nn.compact
    def __call__(self, x, return_weights: bool = False):
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, 2 * self.modes1, self.modes2)
        wr = self.param("weights_re", tinit.spectral_uniform(scale), shape)
        wi = self.param("weights_im", tinit.spectral_uniform(scale), shape)
        if return_weights:  # fused-layer path: parent consumes the params directly
            return wr, wi
        if spectral_impl() == "pallas":
            from blindno.ops.spectral_pallas import spectral_conv2d_pallas

            return spectral_conv2d_pallas(x, wr, wi)
        return spectral.spectral_conv2d(x, wr, wi)


class SpectralConv3d(nn.Module):
    """3D Fourier layer with four +/- corner blocks (``1d_FPE/FNOModules.py:228-271``)."""

    in_channels: int
    out_channels: int
    modes1: int
    modes2: int
    modes3: int

    @nn.compact
    def __call__(self, x):
        scale = 1.0 / (self.in_channels * self.out_channels)
        shape = (self.in_channels, self.out_channels, 2 * self.modes1, 2 * self.modes2, self.modes3)
        wr = self.param("weights_re", tinit.spectral_uniform(scale), shape)
        wi = self.param("weights_im", tinit.spectral_uniform(scale), shape)
        return spectral.spectral_conv3d(x, wr, wi)


class PointwiseConv(nn.Module):
    """1x1 convolution on channel-first data == channel Dense with torch Conv init."""

    features: int

    @nn.compact
    def __call__(self, x, return_weights: bool = False):  # (B, C, *spatial)
        kernel = self.param("kernel", tinit.torch_linear_kernel, (x.shape[1], self.features))
        bias = self.param("bias", tinit.torch_bias_for_fan_in(x.shape[1]), (self.features,))
        if return_weights:  # fused-layer path: parent consumes the params directly
            return kernel, bias
        y = jnp.einsum("bc...,co->bo...", x, kernel)
        return y + bias.reshape((1, -1) + (1,) * (x.ndim - 2))


class FNO1d(nn.Module):
    """(B, N, input_dim) -> (B, N, output_dim). Mirrors ``1d_FPE/FNOModules.py:62-122``."""

    modes: int
    width: int
    n_layers: int
    input_dim: int
    output_dim: int
    padding_frac: float = 0.25

    @nn.compact
    def __call__(self, x):
        x = TorchDense(self.width)(x)  # fc0 lift
        x = jnp.swapaxes(x, -1, -2)  # (B, width, N)
        n = x.shape[-1]
        pad = int(round(n * self.padding_frac))
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad)))
        fused = spectral_impl() == "pallas_fused"
        for k in range(self.n_layers):
            sc = SpectralConv1d(self.width, self.width, self.modes)
            pc = PointwiseConv(self.width)
            if fused:
                from blindno.ops.fno_layer import fno1d_layer

                wr, wi = sc(x, return_weights=True)
                pk, pb = pc(x, return_weights=True)
                x = fno1d_layer(x, wr, wi, pk, pb, dc_half=sc.dc_half,
                                apply_act=k != self.n_layers - 1)
            else:
                x = sc(x) + pc(x)
                if k != self.n_layers - 1:
                    x = gelu(x)
        x = x[..., :n]
        x = jnp.swapaxes(x, -1, -2)
        x = TorchDense(128)(x)  # fc1
        x = gelu(x)
        return TorchDense(self.output_dim)(x)  # fc2


class FNO2d(nn.Module):
    """(B, H, W, input_dim) -> (B, H, W, output_dim). Mirrors ``1d_FPE/FNOModules.py:164-223``.

    Note: the reference hard-codes the projection to 1 channel (``:197``) and all its
    configs use single-channel heads; here ``output_dim`` is honored (default 1).
    """

    modes: int
    width: int
    n_layers: int
    input_dim: int
    output_dim: int = 1
    padding_frac: float = 0.25

    @nn.compact
    def __call__(self, x):
        x = TorchDense(self.width)(x)
        x = jnp.moveaxis(x, -1, 1)  # (B, width, H, W)
        h, w = x.shape[-2], x.shape[-1]
        pad_w = int(round(w * self.padding_frac))
        pad_h = int(round(h * self.padding_frac))
        x = jnp.pad(x, ((0, 0), (0, 0), (0, pad_h), (0, pad_w)))
        fused = spectral_impl() == "pallas_fused"
        for k in range(self.n_layers):
            sc = SpectralConv2d(self.width, self.width, self.modes, self.modes)
            pc = PointwiseConv(self.width)
            if fused:
                from blindno.ops.fno_layer import fno2d_layer

                wr, wi = sc(x, return_weights=True)
                pk, pb = pc(x, return_weights=True)
                x = fno2d_layer(x, wr, wi, pk, pb, apply_act=k != self.n_layers - 1)
            else:
                x = sc(x) + pc(x)
                if k != self.n_layers - 1:
                    x = gelu(x)
        x = x[..., :h, :w]
        x = jnp.moveaxis(x, 1, -1)
        x = TorchDense(128)(x)
        x = gelu(x)
        return TorchDense(self.output_dim)(x)


class FNO3d(nn.Module):
    """(B, D1, D2, D3, input_dim) -> (..., output_dim). Mirrors ``1d_FPE/FNOModules.py:273-349``
    (fixed 4 layers, absolute padding 2; vestigial in the reference — kept for parity)."""

    modes: int
    width: int
    input_dim: int
    output_dim: int
    padding: int = 2

    @nn.compact
    def __call__(self, x):
        x = TorchDense(self.width)(x)
        x = jnp.moveaxis(x, -1, 1)  # (B, width, D1, D2, D3)
        d1, d2, d3 = x.shape[-3:]
        p = self.padding
        x = jnp.pad(x, ((0, 0), (0, 0), (0, p), (0, p), (0, p)))
        for k in range(4):
            x1 = SpectralConv3d(self.width, self.width, self.modes, self.modes, self.modes)(x)
            x2 = PointwiseConv(self.width)(x)
            x = x1 + x2
            if k != 3:
                x = gelu(x)
        x = x[..., :d1, :d2, :d3]
        x = jnp.moveaxis(x, 1, -1)
        x = TorchDense(128)(x)
        x = gelu(x)
        return TorchDense(self.output_dim)(x)
