"""BlinDNO: permutation-invariant attention UNet + FNO heads (the paper's main model).

Unified re-design of the reference's five UNet variants:
- ``PermInvUNet_attn1D`` / ``_bag``          (``1d_FPE/NIOModules.py:212-443``)
- ``PermInvUNet_attn1D_bag`` / ``_bag_GPE``  (``1d_GPE/NIOModules.py:342-564``)
- ``PermInvUNet_attn`` 2-D ConvNeXt          (``2d_FPE/NIOModules.py:1086-1181``)
- ``PermInvUNet_attn`` 2-D plain-conv        (``2d_Non_conservative_FPE/NIOModules.py:932-1050``)
- ``PermInvUNet`` plain, no attention        (``2d_FPE/NIOModules.py:791-897``; vestigial)

One module covers all: spatial rank and block type are parameters; "bag" is the
``subsample`` flag (train-time random set subsampling). Structure per snapshot:
ConvNeXt-UNet (channels ``base_ch * 2^i``), with *set self-attention + masked mean over
the snapshot axis* applied at the bottleneck and at every skip connection, then a final
1x1 conv to ``width`` channels feeding the FNO heads.

Shape arithmetic (odd grid sizes like 61 -> 30 -> 15 -> 7 -> 3) is precomputed
statically from ``input_size`` exactly like the reference's output_padding computation
(``2d_FPE/NIOModules.py:1093-1105``) — XLA requires static shapes anyway.

The reference's NC-suite variant also declares two unused FNO heads
(``fno_drift/fno_diffusion`` next to ``fno_Fx/fno_Fy``, ``:997-1004``); dead parameters
are not reproduced.
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp

from blindno.nn.convnext import ConvNeXtBlock, PlainConvBlock
from blindno.nn.fno import FNO1d, FNO2d
from blindno.nn.setops import TemporalSelfAttention, masked_mean, subsample_set
from blindno.nn.torch_layers import TorchBatchNorm, TorchConv, TorchConvTranspose, max_pool


def _unet_shapes(input_size, depth):
    """Per-level spatial sizes and the ConvTranspose output_paddings that restore them."""
    sizes = [tuple(input_size)]
    for _ in range(depth):
        sizes.append(tuple(s // 2 for s in sizes[-1]))
    pads = []
    cur = sizes[-1]
    for size in reversed(sizes[:-1]):
        pads.append(tuple(s - ((c - 1) * 2 + 2) for s, c in zip(size, cur)))
        cur = size
    return sizes, pads


class PermInvUNetAttn(nn.Module):
    """Input (B, L, *spatial) -> (B, *spatial, sum(head_dims))."""

    input_size: tuple  # (N,) or (H, W)
    depth: int = 4
    base_ch: int = 1
    width: int = 30
    fno_modes: int = 15
    fno_layers: int = 3
    head_dims: tuple = (1, 1)
    block: str = "convnext"  # 'convnext' | 'plain'
    use_attention: bool = True
    subsample: bool = False  # the "_bag" behavior
    l_min: int = 50

    @nn.compact
    def __call__(self, x, grid=None, *, training: bool = False):
        ndim = len(self.input_size)
        if training and self.subsample:
            x, mask = subsample_set(self.make_rng("sample"), x, self.l_min, training)
        else:
            mask = None
        b, l = x.shape[:2]
        spatial = x.shape[2:]
        assert tuple(spatial) == tuple(self.input_size), (spatial, self.input_size)
        chs = [self.base_ch * (2**i) for i in range(self.depth + 1)]
        sizes, pads = _unet_shapes(self.input_size, self.depth)

        def make_block(dim, h):
            if self.block == "convnext":
                return ConvNeXtBlock(dim)(h)
            return PlainConvBlock(dim)(h, training=training)

        h = x.reshape((b * l,) + spatial + (1,))
        feats = []
        for i in range(self.depth + 1):
            h = TorchConv(chs[i], (3,) * ndim, None, 1)(h)
            h = make_block(chs[i], h)
            feats.append(h)
            if i < self.depth:
                h = max_pool(h, 2)

        def set_pool(level_feat, level):
            """Set attention over L + masked mean -> (B, *spatial_level, C)."""
            shp = level_feat.shape
            seq = level_feat.reshape((b, l) + shp[1:])
            if self.use_attention:
                seq = TemporalSelfAttention()(seq, mask)
            if mask is None:
                return seq.mean(axis=1)
            return masked_mean(seq, mask, axis=1)

        h = set_pool(h, self.depth)
        for i in range(self.depth):
            level = self.depth - 1 - i
            h = TorchConvTranspose(chs[level], (2,) * ndim, (2,) * ndim, pads[i])(h)
            skip = set_pool(feats[level], level)
            skip = TorchBatchNorm(use_running_average=not training)(skip)
            h = jnp.concatenate([h, skip], axis=-1)
            # XLA TPU workaround: the transpose-pad/concat/conv fusion miscompiles on
            # this backend (reads uninitialized memory -> f32-max garbage / NaN);
            # verified minimal repro + fix in tests of the up path. The barrier
            # blocks that fusion at negligible cost.
            h = jax.lax.optimization_barrier(h)
            h = TorchConv(chs[level], (3,) * ndim, None, 1)(h)
            h = make_block(chs[level], h)

        fused = TorchConv(self.width, (1,) * ndim, None, 0)(h)  # (B, *spatial, width)
        if ndim == 1:
            heads = [
                FNO1d(self.fno_modes, self.width, self.fno_layers, self.width, d)(fused)
                for d in self.head_dims
            ]
        else:
            heads = [
                FNO2d(self.fno_modes, self.width, self.fno_layers, self.width, d)(fused)
                for d in self.head_dims
            ]
        return jnp.concatenate(heads, axis=-1)
