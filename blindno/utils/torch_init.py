"""Initializers matching PyTorch defaults, for training-dynamics parity.

The reference relies on torch's default inits (kaiming_uniform(a=sqrt(5)) for
Linear/Conv weights, U(+-1/sqrt(fan_in)) for biases) plus a few custom ones
(``1d_FPE/DeepONetModules.py:7-10`` kaiming a=0.01 leaky_relu; Transolver's
trunc_normal(0.02) and orthogonal slice projections). Flax's defaults differ
(lecun_normal, zero bias), which changes early training behavior, so every layer in
this framework takes explicit initializers from here.
"""
from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np


def _uniform(key, shape, dtype, bound):
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def torch_linear_kernel(key, shape, dtype=jnp.float32):
    """Flax Dense kernel (in, out): torch kaiming_uniform(a=sqrt(5)) == U(+-1/sqrt(fan_in))."""
    fan_in = shape[0]
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def torch_conv_kernel(key, shape, dtype=jnp.float32):
    """Flax Conv kernel (*window, in/groups, out): fan_in = prod(shape[:-1])."""
    fan_in = int(np.prod(shape[:-1]))
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def torch_conv_transpose_kernel(key, shape, dtype=jnp.float32):
    """torch ConvTranspose weight is (in, out, *k); torch computes fan_in as
    size(1)*prod(kernel) = out*prod(k). Flax kernel is (*k, in, out)."""
    fan_in = int(np.prod(shape[:-2])) * shape[-1]
    return _uniform(key, shape, dtype, 1.0 / math.sqrt(fan_in))


def torch_bias_for_fan_in(fan_in: int):
    """torch Linear/Conv bias: U(+-1/sqrt(fan_in))."""
    bound = 1.0 / math.sqrt(fan_in) if fan_in > 0 else 0.0

    def init(key, shape, dtype=jnp.float32):
        return _uniform(key, shape, dtype, bound)

    return init


def kaiming_uniform_leaky(a: float = 0.01):
    """torch kaiming_uniform_(a, nonlinearity='leaky_relu') on a Dense kernel (in, out).

    gain = sqrt(2 / (1 + a^2)); bound = gain * sqrt(3 / fan_in).
    Used by the reference's FFN/FeedForwardNN (``1d_FPE/DeepONetModules.py:7-10``).
    """
    gain = math.sqrt(2.0 / (1.0 + a * a))

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0]
        return _uniform(key, shape, dtype, gain * math.sqrt(3.0 / fan_in))

    return init


def spectral_uniform(scale: float):
    """Reference spectral weights: ``scale * U[0, 1)`` per real/imag plane
    (torch.rand on a cfloat tensor; ``1d_FPE/FNOModules.py:40``). Not zero-centered."""

    def init(key, shape, dtype=jnp.float32):
        return scale * jax.random.uniform(key, shape, dtype)

    return init


def trunc_normal(std: float = 0.02):
    """timm trunc_normal_: N(0, std) truncated to +-2 std (Transolver linear weights)."""

    def init(key, shape, dtype=jnp.float32):
        return jax.random.truncated_normal(key, -2.0, 2.0, shape, dtype) * std

    return init


def orthogonal_init():
    """torch orthogonal_ on a (out, in) weight; flax Dense kernel is (in, out)."""
    base = jax.nn.initializers.orthogonal()

    def init(key, shape, dtype=jnp.float32):
        return base(key, (shape[1], shape[0]), dtype).T

    return init


def zeros(key, shape, dtype=jnp.float32):
    return jnp.zeros(shape, dtype)
