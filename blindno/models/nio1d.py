"""1-D NIO composite models: set-of-snapshots -> coefficient fields.

Re-design of ``/root/reference/1d_FPE/NIOModules.py`` (NIOFP, NIOFP_FNO) and the 1-D GPE
variants (``/root/reference/1d_GPE/NIOModules.py:85-289``). Template (SURVEY.md §2.3):
(a) per-snapshot encoder lifts each snapshot to a field on the grid, (b) mean-field
fusion over the snapshot set (frozen fc0 affine; see :class:`blindno.nn.setops.MeanFieldFusion`),
(c) one or two FNO1d heads decode the target fields.

All models: input x (B, L, N), grid (N, 1); output (B, N, n_fields).
Train-time set subsampling uses the 'sample' rng stream; eval uses the full set.
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from blindno.nn.cnn import Encoder1D, EncoderODE
from blindno.nn.deeponet import FFN, DeepOnetNoBias
from blindno.nn.fno import FNO1d
from blindno.nn.setops import MeanFieldFusion, subsample_set


class NIOFP1D(nn.Module):
    """DeepONet-branch NIO (``1d_FPE/NIOModules.py:15-84``).

    ``head_dims``: output channels per FNO head, concatenated along the last axis.
    - 1D FPE drift+diffusion: (1, 1)   [fno_drift, fno_diffusion]
    - 1D Schrodinger V:       (1,)     [fno_V]   (``1d_GPE/NIOModules.py:160-223``)
    - 1D GPE V,g,kappa:       (1, 2)   [fno_V, fno_gk] (``1d_GPE/NIOModules.py:85-155``)
    """

    input_dimensions_trunk: int = 1
    n_hidden_layers: int = 3
    neurons: int = 100
    n_basis: int = 25
    fno_layers: int = 3
    width: int = 30
    modes: int = 15
    head_dims: tuple = (1, 1)
    encoder_final_convs: tuple = ((5, 1), (5, 0), (4, 0))
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        if training:
            x, mask = subsample_set(self.make_rng("sample"), x, self.l_min, training)
        else:
            mask = None
        branch = Encoder1D(self.n_basis, self.encoder_final_convs)
        trunk = FFN(self.input_dimensions_trunk, self.n_basis, self.n_hidden_layers, self.neurons)
        fields = DeepOnetNoBias(branch, trunk)(x, grid, training=training)  # (B, L, N)
        grid_feats = jnp.broadcast_to(grid[None], (x.shape[0],) + grid.shape)  # (B, N, 1)
        fused = MeanFieldFusion(self.width, grid_channels=1)(grid_feats, fields, mask)
        outs = [
            FNO1d(self.modes, self.width, self.fno_layers, self.width, d)(fused)
            for d in self.head_dims
        ]
        return jnp.concatenate(outs, axis=-1)


class NIOFPOde(nn.Module):
    """ODE-observation NIO vestige (``2d_FPE/NIOModules.py:655-717``): EncoderODE
    branch + FFN trunk DeepONet, mean-field fusion, single FNO1d head. Never trained
    by any reference script; kept for component parity."""

    input_dimensions_trunk: int = 1
    n_hidden_layers: int = 3
    neurons: int = 100
    n_basis: int = 25
    fno_layers: int = 3
    width: int = 30
    modes: int = 15
    output_dim: int = 1
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        if training:
            x, mask = subsample_set(self.make_rng("sample"), x, self.l_min, training)
        else:
            mask = None
        branch = EncoderODE(self.n_basis)
        trunk = FFN(self.input_dimensions_trunk, self.n_basis, self.n_hidden_layers, self.neurons)
        fields = DeepOnetNoBias(branch, trunk)(x, grid, training=training)  # (B, L, N)
        grid_feats = jnp.broadcast_to(grid[None], (x.shape[0],) + grid.shape)
        fused = MeanFieldFusion(self.width, grid_channels=1)(grid_feats, fields, mask)
        return FNO1d(self.modes, self.width, self.fno_layers, self.width, self.output_dim)(fused)


class NIOFNO1D(nn.Module):
    """FNO-branch NIO (``1d_FPE/NIOModules.py:87-155``): each snapshot is lifted by a
    small shared FNO1d(modes 12, width 4, 2 layers) on (value, grid) channels."""

    fno_layers: int = 3
    width: int = 30
    modes: int = 15
    head_dims: tuple = (1, 1)
    inner_modes: int = 12
    inner_width: int = 4
    inner_layers: int = 2
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        if training:
            x, mask = subsample_set(self.make_rng("sample"), x, self.l_min, training)
        else:
            mask = None
        b, l, n = x.shape
        snap = x.reshape(b * l, n, 1)
        g = jnp.broadcast_to(grid[None], (b * l,) + grid.shape)
        inner_in = jnp.concatenate([snap, g], axis=-1)  # (B*L, N, 2)
        fields = FNO1d(self.inner_modes, self.inner_width, self.inner_layers, 2, 1)(inner_in)
        fields = fields.reshape(b, l, n)
        grid_feats = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        fused = MeanFieldFusion(self.width, grid_channels=1)(grid_feats, fields, mask)
        outs = [
            FNO1d(self.modes, self.width, self.fno_layers, self.width, d)(fused)
            for d in self.head_dims
        ]
        return jnp.concatenate(outs, axis=-1)
