"""DeepONet building blocks: FFN trunk, branch-trunk combination, activations.

Re-design of ``/root/reference/1d_FPE/DeepONetModules.py`` (identical across suites).
"""
from __future__ import annotations

from typing import Callable

import flax.linen as nn
import jax.numpy as jnp

from blindno.nn.torch_layers import TorchBatchNorm, leaky_relu
from blindno.utils import torch_init as tinit


def activation(name: str) -> Callable:
    """String -> activation, matching ``DeepONetModules.py:42-64``."""
    table = {
        "tanh": jnp.tanh,
        "relu": nn.relu,
        "leaky_relu": lambda x: leaky_relu(x, 0.01),
        "sigmoid": nn.sigmoid,
        "softplus": lambda x: nn.softplus(4.0 * x) / 4.0,  # torch Softplus(beta=4)
        "celu": nn.celu,
        "elu": nn.elu,
        "swish": nn.swish,
        "mish": lambda x: x * jnp.tanh(nn.softplus(x)),
        "sin": jnp.sin,
    }
    key = name.lower()
    if key not in table:
        raise ValueError(f"Unknown activation function: {name}")
    return table[key]


class FourierFeatures(nn.Module):
    """Random Fourier features (``DeepONetModules.py:13-23``; unused in the main path)."""

    scale: float
    mapping_size: int

    @nn.compact
    def __call__(self, x):
        b = self.param(
            "B",
            lambda key, shape: self.scale * jnp.asarray(__import__("jax").random.normal(key, shape)),
            (self.mapping_size, 2),
        )
        proj = (2.0 * jnp.pi * x) @ b.T
        return jnp.concatenate([jnp.sin(proj), jnp.cos(proj)], axis=-1)


class FFN(nn.Module):
    """MLP with BatchNorm between hidden layers — the DeepONet trunk
    (``DeepONetModules.py:155-185``). Custom kaiming(a=0.01, leaky_relu) init, zero bias."""

    input_dimension: int
    output_dimension: int
    n_hidden_layers: int
    neurons: int
    act_string: str = "leaky_relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        act = activation(self.act_string)
        dense = lambda feats: nn.Dense(
            feats, kernel_init=tinit.kaiming_uniform_leaky(0.01), bias_init=tinit.zeros
        )
        x = act(dense(self.neurons)(x))
        for _ in range(self.n_hidden_layers - 1):
            h = dense(self.neurons)(x)
            if self.dropout_rate > 0:
                h = nn.Dropout(self.dropout_rate, deterministic=not training)(h)
            x = TorchBatchNorm(use_running_average=not training)(act(h))
        return dense(self.output_dimension)(x)


class FeedForwardNN(nn.Module):
    """Config-dict flavored MLP (``DeepONetModules.py:82-113``; vestigial but kept)."""

    input_dimension: int
    output_dimension: int
    n_hidden_layers: int
    neurons: int
    act_string: str = "leaky_relu"
    dropout_rate: float = 0.0

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        return FFN(
            self.input_dimension,
            self.output_dimension,
            self.n_hidden_layers,
            self.neurons,
            self.act_string,
            self.dropout_rate,
        )(x, training=training)


class DeepOnetNoBias(nn.Module):
    """Branch(u) . Trunk(x)^T / sqrt(p) + b0 (``DeepONetModules.py:128-151``).

    branch output: (B, L, p); trunk output: (N, p); result: (B, L, N).
    """

    branch: nn.Module
    trunk: nn.Module

    @nn.compact
    def __call__(self, u, x, *, training: bool = False):
        weights = self.branch(u, training=training)  # (B, L, p)
        basis = self.trunk(x, training=training)  # (N, p)
        b0 = self.param("b0", tinit.zeros, ())
        p = basis.shape[-1]
        return (jnp.einsum("blp,np->bln", weights, basis) + b0) / jnp.sqrt(jnp.asarray(p, weights.dtype))
