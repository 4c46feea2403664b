"""3-D NIO (volumetric snapshot sets -> 3-D coefficient field).

Parity with the reference's vestigial 3-D path (``2d_FPE/NIOModules.py:720-788``
``NIOFP3D`` + ``Encoder3D`` + ``FNO3d``; intended for the README-advertised "3D
Protein" suite whose data/scripts are absent from the snapshot, SURVEY.md §0).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from blindno.nn.cnn import Encoder3D
from blindno.nn.deeponet import FFN, DeepOnetNoBias
from blindno.nn.fno import FNO3d
from blindno.nn.setops import MeanFieldFusion, subsample_set


class NIOFP3D(nn.Module):
    """Encoder3D branch + FFN trunk DeepONet over the flattened volume + mean-field
    fusion (3 grid channels) + FNO3d head.

    Input x (B, L, D, H, W), grid (D, H, W, 3); output (B, D, H, W, out_dim).
    """

    input_dimensions_trunk: int = 3
    n_hidden_layers: int = 3
    neurons: int = 100
    n_basis: int = 25
    width: int = 12
    modes: int = 8
    out_dim: int = 1
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid, *, training: bool = False):
        if training:
            x, mask = subsample_set(self.make_rng("sample"), x, self.l_min, training)
        else:
            mask = None
        b, l, d, h, w = x.shape
        branch = Encoder3D(self.n_basis)
        trunk = FFN(self.input_dimensions_trunk, self.n_basis, self.n_hidden_layers, self.neurons)
        fields = DeepOnetNoBias(branch, trunk)(x, grid.reshape(-1, 3), training=training)
        fields = fields.reshape(b, l, d, h, w)
        grid_feats = jnp.broadcast_to(grid[None], (b,) + grid.shape)
        fused = MeanFieldFusion(self.width, grid_channels=3)(grid_feats, fields, mask)
        return FNO3d(self.modes, self.width, self.width, self.out_dim)(fused)
