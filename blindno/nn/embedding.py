"""Positional / rotary / timestep embeddings.

Re-design of ``/root/reference/2d_FPE/model/Embedding.py`` (only ``timestep_embedding``
is referenced by Transolver's time conditioning; the rest kept for inventory parity).
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def timestep_embedding(timesteps, dim: int, max_period: int = 10000):
    """Sinusoidal timestep embeddings (``Embedding.py:timestep_embedding``).

    timesteps: (N,) -> (N, 1, dim).
    """
    half = dim // 2
    freqs = jnp.exp(-math.log(max_period) * jnp.arange(half, dtype=jnp.float32) / half)
    args = timesteps.astype(jnp.float32)[:, None] * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb[:, None, :]


def sinusoidal_position_encoding(n_pos: int, dim: int):
    """Classic transformer positional encoding table (PositionalEncoding)."""
    pos = jnp.arange(n_pos, dtype=jnp.float32)[:, None]
    div = jnp.exp(jnp.arange(0, dim, 2, dtype=jnp.float32) * (-math.log(10000.0) / dim))
    pe = jnp.zeros((n_pos, dim))
    pe = pe.at[:, 0::2].set(jnp.sin(pos * div))
    pe = pe.at[:, 1::2].set(jnp.cos(pos * div[: (dim + 1) // 2]))
    return pe


def rotary_embedding(x, base: float = 10000.0):
    """Rotary position embedding applied over the token axis of (B, T, D)."""
    b, t, d = x.shape
    half = d // 2
    freqs = 1.0 / (base ** (jnp.arange(0, half, dtype=jnp.float32) / half))
    ang = jnp.arange(t, dtype=jnp.float32)[:, None] * freqs[None]
    cos, sin = jnp.cos(ang), jnp.sin(ang)
    x1, x2 = x[..., :half], x[..., half : 2 * half]
    rot = jnp.concatenate([x1 * cos - x2 * sin, x1 * sin + x2 * cos, x[..., 2 * half :]], axis=-1)
    return rot
