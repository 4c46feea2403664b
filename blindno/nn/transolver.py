"""Transolver: physics slice-attention operator transformer.

Re-design of ``/root/reference/2d_FPE/model/Physics_Attention.py`` and
``Transolver_Structured_Mesh_2D.py`` (2-D suites only). The slice attention projects N
grid tokens onto G learned "physics slices" via a temperature-controlled softmax, runs
QKV attention among the G slice tokens, and de-slices back — a linear-attention-style
mechanism that is the reference's only long-sequence scaling device (SURVEY.md §5.7).

All einsums map directly onto the MXU; the structured-mesh variant's k=3 Conv2d
in-projections run as NHWC convs. The reference's hard-coded ``.cuda()`` in the
unified_pos reference grid (``Transolver_Structured_Mesh_2D.py:144``) is gone —
everything is device-neutral by construction.
"""
from __future__ import annotations

from typing import Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from blindno.nn.torch_layers import TorchConv
from blindno.utils import torch_init as tinit


def _trunc_dense(features, use_bias=True):
    return nn.Dense(features, use_bias=use_bias, kernel_init=tinit.trunc_normal(0.02), bias_init=tinit.zeros)


class PhysicsAttention(nn.Module):
    """Slice attention. ``mesh_shape=None`` -> irregular-mesh Linear in-projections
    (``Physics_Attention.py:6-57``); ``mesh_shape=(H, W)`` or ``(D, H, W)`` -> Conv
    in-projections with clamped temperature (``:60-116`` / ``:119-175``)."""

    dim: int
    heads: int = 8
    dim_head: int = 64
    slice_num: int = 64
    mesh_shape: Optional[tuple] = None
    dropout: float = 0.0

    @nn.compact
    def __call__(self, x, *, training: bool = False):
        b, n, c = x.shape
        inner = self.heads * self.dim_head
        temperature = self.param("temperature", lambda k, s: 0.5 * jnp.ones(s), (1, self.heads, 1, 1))

        if self.mesh_shape is None:
            fx_mid = _trunc_dense(inner)(x)
            x_mid = _trunc_dense(inner)(x)
            temp = temperature
        else:
            ndim = len(self.mesh_shape)
            xg = x.reshape((b,) + tuple(self.mesh_shape) + (c,))
            fx_mid = TorchConv(inner, (3,) * ndim, None, 1)(xg).reshape(b, n, inner)
            x_mid = TorchConv(inner, (3,) * ndim, None, 1)(xg).reshape(b, n, inner)
            temp = jnp.clip(temperature, 0.1, 5.0)

        def heads_split(t):  # (B, N, inner) -> (B, H, N, dh)
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        fx_mid = heads_split(fx_mid)
        x_mid = heads_split(x_mid)

        slice_logits = nn.Dense(
            self.slice_num, kernel_init=tinit.orthogonal_init(), bias_init=tinit.zeros
        )(x_mid)  # (B, H, N, G)
        slice_weights = jax.nn.softmax(slice_logits / temp, axis=-1)
        slice_norm = slice_weights.sum(axis=2)  # (B, H, G)
        slice_token = jnp.einsum("bhnc,bhng->bhgc", fx_mid, slice_weights)
        slice_token = slice_token / (slice_norm[..., None] + 1e-5)

        q = _trunc_dense(self.dim_head, use_bias=False)(slice_token)
        k = _trunc_dense(self.dim_head, use_bias=False)(slice_token)
        v = _trunc_dense(self.dim_head, use_bias=False)(slice_token)
        dots = jnp.einsum("bhgd,bhkd->bhgk", q, k) * (self.dim_head**-0.5)
        attn = jax.nn.softmax(dots, axis=-1)
        if self.dropout > 0:
            attn = nn.Dropout(self.dropout, deterministic=not training)(attn)
        out_slice = jnp.einsum("bhgk,bhkd->bhgd", attn, v)

        out = jnp.einsum("bhgc,bhng->bhnc", out_slice, slice_weights)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        out = _trunc_dense(self.dim)(out)
        if self.dropout > 0:
            out = nn.Dropout(self.dropout, deterministic=not training)(out)
        return out


class TransolverMLP(nn.Module):
    """pre/post Linear MLP with optional residual inner layers
    (``Transolver_Structured_Mesh_2D.py:12-37``)."""

    n_hidden: int
    n_output: int
    n_layers: int = 0
    res: bool = True

    @nn.compact
    def __call__(self, x):
        h = nn.gelu(_trunc_dense(self.n_hidden)(x), approximate=False)
        for _ in range(self.n_layers):
            inner = nn.gelu(_trunc_dense(self.n_hidden)(h), approximate=False)
            h = inner + h if self.res else inner
        return _trunc_dense(self.n_output)(h)


class TransolverBlock(nn.Module):
    """Pre-LN slice-attention + MLP residual block (``:40-74``)."""

    num_heads: int
    hidden_dim: int
    dropout: float = 0.0
    mlp_ratio: int = 1
    last_layer: bool = False
    out_dim: int = 1
    slice_num: int = 32
    mesh_shape: Optional[tuple] = None

    @nn.compact
    def __call__(self, fx, *, training: bool = False):
        attn = PhysicsAttention(
            self.hidden_dim,
            heads=self.num_heads,
            dim_head=self.hidden_dim // self.num_heads,
            slice_num=self.slice_num,
            mesh_shape=self.mesh_shape,
            dropout=self.dropout,
        )
        fx = attn(nn.LayerNorm()(fx), training=training) + fx
        fx = TransolverMLP(self.hidden_dim * self.mlp_ratio, self.hidden_dim, n_layers=0, res=False)(
            nn.LayerNorm()(fx)
        ) + fx
        if self.last_layer:
            return _trunc_dense(self.out_dim)(nn.LayerNorm()(fx))
        return fx


class Transolver(nn.Module):
    """Structured-mesh / irregular-mesh Transolver model (``:77-174``).

    __call__(x, fx): x = positions or unified-pos features, fx = function values (or
    None) — the reference call convention ``model(fx, x)`` used by the NIO wrappers
    (``2d_FPE/NIOModules.py:105-117``).
    """

    space_dim: int = 2
    n_layers: int = 3
    n_hidden: int = 32
    dropout: float = 0.0
    n_head: int = 4
    mlp_ratio: int = 1
    fun_dim: int = 1
    out_dim: int = 1
    slice_num: int = 16
    ref: int = 8
    unified_pos: bool = False
    mesh_shape: Optional[tuple] = None  # (H, W) for structured 2-D; None for irregular
    time_input: bool = False

    def _unified_pos_features(self):
        h, w = self.mesh_shape
        gx, gy = np.meshgrid(np.linspace(0, 1, h), np.linspace(0, 1, w), indexing="ij")
        grid = np.stack([gx, gy], -1).reshape(h * w, 1, 2)
        rx, ry = np.meshgrid(np.linspace(0, 1, self.ref), np.linspace(0, 1, self.ref), indexing="ij")
        refg = np.stack([rx, ry], -1).reshape(1, self.ref * self.ref, 2)
        pos = np.sqrt(((grid - refg) ** 2).sum(-1)).reshape(1, h * w, self.ref * self.ref)
        return jnp.asarray(pos, jnp.float32)

    @nn.compact
    def __call__(self, x, fx=None, t=None, *, training: bool = False):
        if self.unified_pos and self.mesh_shape is not None:
            x = jnp.broadcast_to(self._unified_pos_features(), (x.shape[0],) + self._unified_pos_features().shape[1:])
        if fx is not None:
            fx = jnp.concatenate([x, fx], axis=-1)
            fx = TransolverMLP(self.n_hidden * 2, self.n_hidden, n_layers=0, res=False)(fx)
        else:
            placeholder = self.param(
                "placeholder", lambda k, s: (1.0 / self.n_hidden) * jax.random.uniform(k, s), (self.n_hidden,)
            )
            fx = TransolverMLP(self.n_hidden * 2, self.n_hidden, n_layers=0, res=False)(x)
            fx = fx + placeholder[None, None, :]
        if t is not None and self.time_input:
            from blindno.nn.embedding import timestep_embedding

            emb = timestep_embedding(t, self.n_hidden)
            emb = nn.Dense(self.n_hidden, kernel_init=tinit.trunc_normal(0.02), bias_init=tinit.zeros)(emb)
            emb = nn.Dense(self.n_hidden, kernel_init=tinit.trunc_normal(0.02), bias_init=tinit.zeros)(nn.silu(emb))
            fx = fx + emb
        for i in range(self.n_layers):
            fx = TransolverBlock(
                num_heads=self.n_head,
                hidden_dim=self.n_hidden,
                dropout=self.dropout,
                mlp_ratio=self.mlp_ratio,
                out_dim=self.out_dim,
                slice_num=self.slice_num,
                mesh_shape=self.mesh_shape,
                last_layer=(i == self.n_layers - 1),
            )(fx, training=training)
        return fx
