"""Field-space evaluation metrics.

The headline metric is the train scripts' test loss: per-sample relative L2 per output
field, summed over fields, averaged over the test split (``1d_FPE/train_nio.py:131-143``).
Reference quirk reproduced by default: the denominator is the norm of the FULL
multi-channel target, not the per-field slice (``torch.norm(outputs.view(...))`` at
``:136,138``) — set ``reference_denominator=False`` for the per-field version.
"""
from __future__ import annotations

import jax.numpy as jnp


def relative_l2_per_field(pred, target, reference_denominator: bool = True):
    """pred/target: (B, *grid, F). Returns per-sample per-field rel-L2, shape (B, F)."""
    b = pred.shape[0]
    f = pred.shape[-1]
    dp = pred.reshape(b, -1, f)
    dt = target.reshape(b, -1, f)
    num = jnp.linalg.norm(dp - dt, axis=1)  # (B, F)
    if reference_denominator:
        den = jnp.linalg.norm(dt.reshape(b, -1), axis=1, keepdims=True)  # (B, 1)
    else:
        den = jnp.linalg.norm(dt, axis=1)
    return num / jnp.maximum(den, 1e-12)


def mse(pred, target):
    return jnp.mean((pred - target) ** 2)
