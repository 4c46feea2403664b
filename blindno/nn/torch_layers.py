"""Flax layers with PyTorch semantics (init, padding, norm momentum).

All modules here use channel-LAST layout (flax/TPU native: NWC / NHWC / NDHWC), unlike
the reference's channel-first torch modules. Model code converts at the boundaries.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blindno.utils import torch_init as tinit


def _pair(p, ndim):
    if isinstance(p, int):
        return ((p, p),) * ndim
    return tuple((int(a), int(a)) if isinstance(a, int) else tuple(a) for a in p)


class TorchConv(nn.Module):
    """nn.Conv with torch default init and integer symmetric padding."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Sequence[int] | int = 0
    feature_group_count: int = 1
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        fan_in = int(np.prod(ks)) * (x.shape[-1] // self.feature_group_count)
        return nn.Conv(
            features=self.features,
            kernel_size=ks,
            strides=tuple(self.strides) if self.strides else (1,) * len(ks),
            padding=_pair(self.padding, len(ks)),
            feature_group_count=self.feature_group_count,
            use_bias=self.use_bias,
            kernel_init=tinit.torch_conv_kernel,
            bias_init=tinit.torch_bias_for_fan_in(fan_in),
        )(x)


class TorchConvTranspose(nn.Module):
    """ConvTranspose matching torch's output size ``(in-1)*s + k + output_padding``
    with torch's transpose-conv weight init. Channel-last."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int]
    output_padding: Sequence[int] | int = 0

    @nn.compact
    def __call__(self, x):
        ks = tuple(self.kernel_size)
        st = tuple(self.strides)
        ndim = len(ks)
        opad = (self.output_padding,) * ndim if isinstance(self.output_padding, int) else tuple(self.output_padding)
        fan_in = int(np.prod(ks)) * self.features  # torch: size(1)*prod(k) = out*prod(k)
        y = nn.ConvTranspose(
            features=self.features,
            kernel_size=ks,
            strides=st,
            padding="VALID",
            use_bias=True,
            kernel_init=tinit.torch_conv_transpose_kernel,
            bias_init=tinit.torch_bias_for_fan_in(fan_in),
        )(x)
        # flax VALID transpose output: (in-1)*s + k ; torch adds output_padding rows.
        pads = [(0, 0)] + [(0, int(p)) for p in opad] + [(0, 0)]
        if any(p for _, p in pads):
            y = jnp.pad(y, pads)
            # XLA TPU workaround: fusing this pad into a downstream concat+conv
            # miscompiles on this backend (reads uninitialized memory -> values up to
            # f32-max / NaN; reproduced in /tmp-style minimal case: convtranspose ->
            # pad -> concat -> conv at 61x61 with 1-2 channels). The barrier blocks
            # that fusion and costs one materialization of a small tensor.
            y = jax.lax.optimization_barrier(y)
        return y


class TorchBatchNorm(nn.Module):
    """BatchNorm over all non-feature axes; torch defaults (eps 1e-5, momentum 0.1)."""

    use_running_average: bool

    @nn.compact
    def __call__(self, x):
        # torch.cuda.amp semantics: BatchNorm always computes in f32 (autocast puts
        # batch_norm on the fp32 list) — under a bf16 activation stream the input is
        # promoted for the affine/normalization arithmetic (flax already forces the
        # mean/var reductions to f32) and the result is cast back, so downstream convs
        # keep streaming bf16. A pure-f32 stream is unchanged (y.astype is a no-op),
        # preserving the golden torch-parity paths.
        y = nn.BatchNorm(
            use_running_average=self.use_running_average,
            momentum=0.9,  # flax EMA decay == 1 - torch momentum
            epsilon=1e-5,
            dtype=jnp.float32,
        )(x)
        return y.astype(x.dtype)


class TorchLayerNorm(nn.Module):
    """LayerNorm over the last axis, torch eps semantics."""

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x):
        return nn.LayerNorm(epsilon=self.epsilon)(x)


def max_pool(x, window: int):
    """torch MaxPoolNd(window) with stride=window, floor mode. Channel-last."""
    ndim = x.ndim - 2
    dims = (window,) * ndim
    return nn.max_pool(x, window_shape=dims, strides=dims, padding="VALID")


def leaky_relu(x, slope: float = 0.01):
    return jnp.where(x >= 0, x, slope * x)


def gelu(x):
    """torch F.gelu default = exact erf formulation (jax default is tanh approx)."""
    return nn.gelu(x, approximate=False)


class TorchDense(nn.Module):
    """Dense with torch nn.Linear default init."""

    features: int
    use_bias: bool = True

    @nn.compact
    def __call__(self, x):
        return nn.Dense(
            self.features,
            use_bias=self.use_bias,
            kernel_init=tinit.torch_linear_kernel,
            bias_init=tinit.torch_bias_for_fan_in(x.shape[-1]),
        )(x)
