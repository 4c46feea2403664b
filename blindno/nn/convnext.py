"""ConvNeXt blocks (1-D / 2-D), channel-last.

Re-design of ``ConvNeXtBlock1D`` (``1d_FPE/NIOModules.py:165-184``) and ``ConvNeXtBlock``
(``2d_FPE/NIOModules.py:1044-1062``): depthwise conv(k=7, p=3, groups=dim) -> LayerNorm
(eps 1e-6) -> Linear(4*dim) -> GELU -> Linear(dim) -> residual.
"""
from __future__ import annotations

import flax.linen as nn

from blindno.nn.torch_layers import TorchConv, TorchDense, gelu


class ConvNeXtBlock(nn.Module):
    """Works for any spatial rank; input (B, *spatial, C)."""

    dim: int

    @nn.compact
    def __call__(self, x):
        ndim = x.ndim - 2
        shortcut = x
        h = TorchConv(self.dim, (7,) * ndim, None, 3, feature_group_count=self.dim)(x)
        h = nn.LayerNorm(epsilon=1e-6, use_fast_variance=False)(h)
        h = TorchDense(4 * self.dim)(h)
        h = gelu(h)
        h = TorchDense(self.dim)(h)
        return h + shortcut


class PlainConvBlock(nn.Module):
    """Conv3 + BatchNorm + ReLU, the block used by the NC-suite UNet
    (``2d_Non_conservative_FPE/NIOModules.py:956-968``) and the vestigial
    ``PermInvUNet`` (``2d_FPE/NIOModules.py:791-897``)."""

    dim: int

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        from blindno.nn.torch_layers import TorchBatchNorm

        h = TorchConv(self.dim, (3,) * (x.ndim - 2), None, 1)(x)
        h = TorchBatchNorm(use_running_average=not training)(h)
        return nn.relu(h)
