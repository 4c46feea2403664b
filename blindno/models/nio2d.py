"""2-D NIO composite models (2-D FPE and 2-D non-conservative FPE suites).

Re-design of ``/root/reference/2d_FPE/NIOModules.py`` / the NC-suite copy (head names
``fno_Fx/fno_Fy`` there; structurally identical, so one class set covers both — the
target semantics live in the dataset, ``head_dims=(1, 1)`` either way).

All models: input x (B, L, Nx, Ny), grid (Nx, Ny, 2); output (B, Nx, Ny, 2).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from blindno.nn.cnn import Encoder2D
from blindno.nn.deeponet import FFN, DeepOnetNoBias
from blindno.nn.fno import FNO2d
from blindno.nn.setops import (
    MeanFieldFusion,
    TokenMeanFusion,
    set_self_attention,
    subsample_set,
)
from blindno.nn.transolver import Transolver


def _heads(fused, modes, width, layers, head_dims):
    outs = [FNO2d(modes, width, layers, width, d)(fused) for d in head_dims]
    return jnp.concatenate(outs, axis=-1)


def _maybe_subsample(module, x, training):
    if training:
        return subsample_set(module.make_rng("sample"), x, module.l_min, training)
    return x, None


class NIOFP2D(nn.Module):
    """Encoder2D branch + FFN trunk DeepONet + mean-field fusion + dual FNO2d
    (``2d_FPE/NIOModules.py:14-83``). The "NIO" baseline of the paper."""

    input_dimensions_trunk: int = 2
    n_hidden_layers: int = 3
    neurons: int = 100
    n_basis: int = 25
    fno_layers: int = 3
    width: int = 12
    modes: int = 32
    head_dims: tuple = (1, 1)
    encoder_final_kernel: tuple = (2, 1)
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        x, mask = _maybe_subsample(self, x, training)
        b, l, nx, ny = x.shape
        branch = Encoder2D(self.n_basis, self.encoder_final_kernel)
        trunk = FFN(self.input_dimensions_trunk, self.n_basis, self.n_hidden_layers, self.neurons)
        grid_flat = grid.reshape(-1, 2)
        fields = DeepOnetNoBias(branch, trunk)(x, grid_flat, training=training)  # (B, L, Nx*Ny)
        fields = fields.reshape(b, l, nx, ny)
        grid_feats = jnp.broadcast_to(grid[None], (b,) + grid.shape)  # (B, Nx, Ny, 2)
        fused = MeanFieldFusion(self.width, grid_channels=2)(grid_feats, fields, mask)
        return _heads(fused, self.modes, self.width, self.fno_layers, self.head_dims)


class NIOFNO2D(nn.Module):
    """Small shared FNO2d per-snapshot encoder + mean-field fusion + dual FNO2d
    (``2d_FPE/NIOModules.py:508-581``). The "NIO-FNO" baseline."""

    fno_layers: int = 3
    width: int = 12
    modes: int = 32
    head_dims: tuple = (1, 1)
    inner_modes: int = 12
    inner_width: int = 4
    inner_layers: int = 2
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        x, mask = _maybe_subsample(self, x, training)
        b, l, nx, ny = x.shape
        snap = x.reshape(b * l, nx, ny, 1)
        g = jnp.broadcast_to(grid[None], (b * l,) + grid.shape)
        inner = jnp.concatenate([snap, g], axis=-1)  # (B*L, Nx, Ny, 3)
        fields = FNO2d(self.inner_modes, self.inner_width, self.inner_layers, 3, 1)(inner)
        fields = fields.reshape(b, l, nx, ny)
        grid_feats = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        fused = MeanFieldFusion(self.width, grid_channels=2)(grid_feats, fields, mask)
        return _heads(fused, self.modes, self.width, self.fno_layers, self.head_dims)


class NIOTrans2D(nn.Module):
    """Per-snapshot Transolver encoder + mean-field fusion + dual FNO2d
    (``2d_FPE/NIOModules.py:85-166``)."""

    fno_layers: int = 3
    width: int = 12
    modes: int = 32
    head_dims: tuple = (1, 1)
    trans_layers: int = 3
    trans_hidden: int = 32
    trans_heads: int = 4
    slice_num: int = 16
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        x, mask = _maybe_subsample(self, x, training)
        b, l, nx, ny = x.shape
        vals = x.reshape(b * l, nx * ny, 1)
        g = jnp.broadcast_to(grid.reshape(1, nx * ny, 2), (b * l, nx * ny, 2))
        trans = Transolver(
            space_dim=2, n_layers=self.trans_layers, n_hidden=self.trans_hidden,
            n_head=self.trans_heads, fun_dim=1, out_dim=1, slice_num=self.slice_num,
            mesh_shape=(nx, ny),
        )
        fields = trans(vals, g, training=training).reshape(b, l, nx, ny)
        grid_feats = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        fused = MeanFieldFusion(self.width, grid_channels=2)(grid_feats, fields, mask)
        return _heads(fused, self.modes, self.width, self.fno_layers, self.head_dims)


def _token_attention_tokens(fields, grid, mask):
    """Stack (grid_x, grid_y, per-snapshot fields) as T = L + 2 tokens of dim nx*ny and
    apply unparameterized self-attention (``2d_FPE/NIOModules.py:241-262``)."""
    b, l, nx, ny = fields.shape
    grid_tokens = jnp.broadcast_to(
        grid.transpose(2, 0, 1)[None], (b, 2, nx, ny)
    )
    tokens = jnp.concatenate([grid_tokens, fields], axis=1)  # (B, T, nx, ny)
    full_mask = None
    if mask is not None:
        full_mask = jnp.concatenate([jnp.ones((2,), mask.dtype), mask])
    z = set_self_attention(tokens.reshape(b, l + 2, nx * ny), full_mask)
    return z.reshape(b, l + 2, nx, ny), full_mask


class NIOTransAttn2D(nn.Module):
    """Transolver encoder + token self-attention fusion (``2d_FPE/NIOModules.py:169-296``).

    Fusion splits the T = L+2 attended tokens back into 2 grid tokens + L field tokens
    and applies the mean-field affine over the field tokens."""

    fno_layers: int = 3
    width: int = 12
    modes: int = 32
    head_dims: tuple = (1, 1)
    trans_layers: int = 3
    trans_hidden: int = 32
    trans_heads: int = 4
    slice_num: int = 16
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        x, mask = _maybe_subsample(self, x, training)
        b, l, nx, ny = x.shape
        vals = x.reshape(b * l, nx * ny, 1)
        g = jnp.broadcast_to(grid.reshape(1, nx * ny, 2), (b * l, nx * ny, 2))
        trans = Transolver(
            space_dim=2, n_layers=self.trans_layers, n_hidden=self.trans_hidden,
            n_head=self.trans_heads, fun_dim=1, out_dim=1, slice_num=self.slice_num,
            mesh_shape=(nx, ny),
        )
        fields = trans(vals, g, training=training).reshape(b, l, nx, ny)
        z, _ = _token_attention_tokens(fields, grid, mask)
        grid_feats = jnp.moveaxis(z[:, :2], 1, -1)  # attended grid tokens (B, nx, ny, 2)
        fused = MeanFieldFusion(self.width, grid_channels=2)(grid_feats, z[:, 2:], mask)
        return _heads(fused, self.modes, self.width, self.fno_layers, self.head_dims)


class NIOFNOAttn2D(nn.Module):
    """Small FNO2d encoder + token self-attention + mean-over-ALL-tokens fusion
    (``2d_FPE/NIOModules.py:300-408``; note its fc0 is Linear(1, width) averaged over
    every token including the grid tokens, ``:388-399``)."""

    fno_layers: int = 3
    width: int = 12
    modes: int = 32
    head_dims: tuple = (1, 1)
    inner_modes: int = 12
    inner_width: int = 4
    inner_layers: int = 2
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        x, mask = _maybe_subsample(self, x, training)
        b, l, nx, ny = x.shape
        snap = x.reshape(b * l, nx, ny, 1)
        g = jnp.broadcast_to(grid[None], (b * l,) + grid.shape)
        inner = jnp.concatenate([snap, g], axis=-1)
        fields = FNO2d(self.inner_modes, self.inner_width, self.inner_layers, 3, 1)(inner)
        fields = fields.reshape(b, l, nx, ny)
        z, _ = _token_attention_tokens(fields, grid, mask)
        fused = TokenMeanFusion(self.width, n_always=2)(z, mask)
        return _heads(fused, self.modes, self.width, self.fno_layers, self.head_dims)


class NIOAttn2D(nn.Module):
    """DeepONet encoder + token self-attention fusion (``2d_FPE/NIOModules.py:410-504``)."""

    input_dimensions_trunk: int = 2
    n_hidden_layers: int = 3
    neurons: int = 100
    n_basis: int = 25
    fno_layers: int = 3
    width: int = 12
    modes: int = 32
    head_dims: tuple = (1, 1)
    encoder_final_kernel: tuple = (2, 1)
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        x, mask = _maybe_subsample(self, x, training)
        b, l, nx, ny = x.shape
        branch = Encoder2D(self.n_basis, self.encoder_final_kernel)
        trunk = FFN(self.input_dimensions_trunk, self.n_basis, self.n_hidden_layers, self.neurons)
        fields = DeepOnetNoBias(branch, trunk)(x, grid.reshape(-1, 2), training=training)
        fields = fields.reshape(b, l, nx, ny)
        z, _ = _token_attention_tokens(fields, grid, mask)
        grid_feats = jnp.moveaxis(z[:, :2], 1, -1)
        fused = MeanFieldFusion(self.width, grid_channels=2)(grid_feats, z[:, 2:], mask)
        return _heads(fused, self.modes, self.width, self.fno_layers, self.head_dims)
