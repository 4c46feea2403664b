"""Permutation-invariant set operations: subsampling, masked means, set attention, fusion.

This is the architectural heart of the BlinDNO/NIO family: every model consumes an
*unordered set* of L solution snapshots and must be permutation invariant over L
(SURVEY.md §0). The reference implements this with (a) train-time random subsampling of
the set (``1d_FPE/NIOModules.py:57-60``: ``L ~ randint(50, L_max)`` indices drawn *with
replacement*), (b) an unparameterized set self-attention (``:186-210``), and (c) the
"fc0 weight surgery" mean-field fusion (``:73-79``).

TPU-native re-design (jit-safe, static shapes):
- Subsampling keeps the full L_max axis: we draw L_max with-replacement indices and an
  effective length L, and return a boolean *mask* selecting the first L draws. Masked
  means/attention over the gathered set are then *distributionally identical* to the
  reference's variable-length subsample, with zero recompilation.
- The fc0 surgery is re-expressed as the explicit affine map it computes:
  ``out = grid_feats @ W_g + mean_L(snap_feats) * w_s + b``. In the reference the
  weights are only ever touched through ``.data``, so they receive **no gradients** and
  stay frozen at their random init (this is why the 2-D DDP scripts need
  ``find_unused_parameters=True``). We replicate that with ``stop_gradient`` by default
  and expose ``trainable=True`` as a documented improvement flag.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from blindno.utils import torch_init as tinit

NEG_INF = -1e9


def subsample_set(key, x, l_min: int = 50, training: bool = True):
    """Train-time random set subsample, jit-safe.

    x: (B, L_max, ...). Returns (x_gathered, mask) where mask has shape (L_max,) float,
    ``mask[t] = 1[t < L]`` with ``L ~ U{l_min, ..., L_max-1}`` and x_gathered is x
    indexed by L_max with-replacement draws (same distribution as the reference's
    ``np.random.choice(L_max, L)`` followed by dense compute on L items).

    BN caveat: all L_max gathered items flow through downstream per-snapshot encoders,
    so BatchNorm batch statistics are computed over L_max items rather than the
    reference's L selected items. Masked means/attention are distributionally
    identical; BN statistics differ only in that masked-out items (draws from the same
    distribution) also contribute — practical impact negligible.
    """
    l_max = x.shape[1]
    if not training:
        return x, jnp.ones((l_max,), x.dtype)
    k1, k2 = jax.random.split(key)
    l_eff = jax.random.randint(k1, (), l_min, l_max)
    idx = jax.random.randint(k2, (l_max,), 0, l_max)
    mask = (jnp.arange(l_max) < l_eff).astype(x.dtype)
    return jnp.take(x, idx, axis=1), mask


def masked_mean(x, mask, axis: int = 1):
    """Mean over the set axis counting only mask==1 entries. mask: (L,) or (B, L)."""
    shape = [1] * x.ndim
    shape[axis] = x.shape[axis]
    if mask.ndim == 2:
        shape[0] = x.shape[0]
    m = mask.reshape(shape)
    return (x * m).sum(axis) / jnp.maximum(m.sum(axis), 1.0)


def set_self_attention(x_flat, mask=None, scale=None):
    """Unparameterized Q=K=V self-attention over a token set.

    x_flat: (B, T, D). Scores ``x x^T / sqrt(D)`` (or given scale), key-masked softmax,
    returns (B, T, D). Matches ``TemporalSelfAttention``'s core
    (``1d_FPE/NIOModules.py:194-210``) and the token-fusion attention of the 2-D NIO
    variants (``2d_FPE/NIOModules.py:248-262``).
    """
    d = x_flat.shape[-1]
    if scale is None:
        scale = jnp.sqrt(jnp.asarray(d, x_flat.dtype))
    # HIGHEST: TPU's default bf16 matmul passes lose too much precision on these
    # huge token dims (d up to C*H*W ~ 3721) and can destabilize training
    scores = jnp.einsum("btd,bsd->bts", x_flat, x_flat,
                        precision=jax.lax.Precision.HIGHEST) / scale
    if mask is not None:
        key_mask = mask.reshape((1, 1, -1)) if mask.ndim == 1 else mask[:, None, :]
        scores = scores + (1.0 - key_mask) * NEG_INF
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("bts,bsd->btd", attn, x_flat)


class TemporalSelfAttention(nn.Module):
    """Set self-attention + residual + LayerNorm over flattened (C x spatial) tokens
    (``1d_FPE/NIOModules.py:186-210``, 2-D version ``2d_FPE/NIOModules.py:1065-1083``).

    Input: (B, T, C, *spatial). The scale is sqrt(C * prod(spatial)) — a static quantity.
    """

    @nn.compact
    def __call__(self, x, mask=None):
        b, t = x.shape[:2]
        d = 1
        for s in x.shape[2:]:
            d *= s
        x_flat = x.reshape(b, t, d)
        out = set_self_attention(x_flat, mask)
        out = out + x_flat
        # use_fast_variance=False: E[x^2]-E[x]^2 cancels catastrophically for these
        # wide (C*spatial) token vectors on TPU and can go negative -> NaN
        out = nn.LayerNorm(epsilon=1e-5, use_fast_variance=False)(out)
        return out.reshape(x.shape)


class MeanFieldFusion(nn.Module):
    """The "fc0 weight surgery" as an explicit mean-field affine map.

    Declares a Linear(grid_channels + 1 -> width); applies
    ``grid_feats @ W[:gc] + masked_mean_L(snap_feats)[..., None] * W[gc] + b``.
    Identical math to ``1d_FPE/NIOModules.py:70-79`` / ``2d_FPE/NIOModules.py:67-77``.

    grid_feats: (B, *spatial, grid_channels); snap_feats: (B, L, *spatial).
    Returns (B, *spatial, width).
    """

    width: int
    grid_channels: int
    trainable: bool = False

    @nn.compact
    def __call__(self, grid_feats, snap_feats, mask=None):
        cin = self.grid_channels + 1
        w = self.param("kernel", tinit.torch_linear_kernel, (cin, self.width))
        b = self.param("bias", tinit.torch_bias_for_fan_in(cin), (self.width,))
        if not self.trainable:
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b)
        if mask is None:
            mean = snap_feats.mean(axis=1)
        else:
            mean = masked_mean(snap_feats, mask, axis=1)
        out = grid_feats @ w[: self.grid_channels] + mean[..., None] * w[self.grid_channels]
        return out + b


class TokenMeanFusion(nn.Module):
    """Variant used by ``NIOFP2D_FNO_attn`` (``2d_FPE/NIOModules.py:333,388-399``):
    a Linear(1 -> width) whose single weight column is averaged over ALL T tokens
    (grid tokens included): ``mean_T(tokens)[..., None] * w0 + b``.

    tokens: (B, T, *spatial) -> (B, *spatial, width). mask covers the snapshot tokens;
    grid tokens (first ``n_always`` entries of T) are always valid.
    """

    width: int
    n_always: int = 2
    trainable: bool = False

    @nn.compact
    def __call__(self, tokens, mask=None):
        w = self.param("kernel", tinit.torch_linear_kernel, (1, self.width))
        b = self.param("bias", tinit.torch_bias_for_fan_in(1), (self.width,))
        if not self.trainable:
            w = jax.lax.stop_gradient(w)
            b = jax.lax.stop_gradient(b)
        if mask is not None:
            full = jnp.concatenate([jnp.ones((self.n_always,), mask.dtype), mask])
        else:
            full = jnp.ones((tokens.shape[1],), tokens.dtype)
        mean = masked_mean(tokens, full, axis=1)
        return mean[..., None] * w[0] + b
