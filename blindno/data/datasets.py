"""Dataset containers, normalization conventions, and jit-friendly batching.

The reference defines torch ``Dataset`` subclasses inline in every train script; the
normalization conventions are load-bearing (SURVEY.md §1 L1) and are reproduced here
exactly:

- FPE suites: fixed unit-rescale constants, then per-gridpoint standardization with
  train-set statistics (``1d_FPE/train_nio.py:19-37``, ``2d_FPE/train_nio.py:21-38``,
  ``2d_Non_conservative_FPE/train_nio.py:21-36``).
- GPE suites: global divide-by-max only, with ``y_max = y.max()/3`` etc.
  (``1d_GPE/train_nio_GPE.py:46-57``) or the plain ``/max`` of ``train_GPE.py:25-36``.

TPU-first: datasets are small (<= a few GB) so whole splits live as device arrays;
"dataloading" is a device-side gather by a permuted index array per epoch — no host
loop, no workers. Train batches drop the final partial batch (static shapes under jit);
eval pads the last batch and masks it in the metric.
"""
from __future__ import annotations

from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np


@dataclass
class FieldStats:
    """Per-field standardization stats (computed AFTER unit rescale, like the reference)."""

    scale: float
    mean: np.ndarray
    std: np.ndarray

    @classmethod
    def standardize(cls, raw: np.ndarray, scale: float, axes) -> tuple["FieldStats", np.ndarray]:
        scaled = raw.astype(np.float32) * scale
        mean = scaled.mean(axis=axes, keepdims=True)
        std = scaled.std(axis=axes, keepdims=True) + 1e-8
        return cls(scale, mean, std), (scaled - mean) / std

    def normalize(self, raw: np.ndarray) -> np.ndarray:
        return (raw.astype(np.float32) * self.scale - self.mean) / self.std

    def denormalize(self, norm):
        return (norm * jnp.asarray(self.std) + jnp.asarray(self.mean)) / self.scale


# Unit-rescale constants per suite (traj, target fields) — SURVEY.md §1 L1.
FPE1D_SCALES = {"trajectories": 1e5, "potential": 1e20, "drag": 1e5}
FPE2D_SCALES = {"trajectories": 1e10, "potential": 1e21, "drag": 1e6}
NCFPE2D_SCALES = {"trajectories": 1e10, "F": 1e12}


@dataclass
class SetToFieldData:
    """Normalized arrays for one suite: inputs (M, L, *grid), targets (M, *grid, n_fields)."""

    inputs: np.ndarray
    targets: np.ndarray
    stats: dict = field(default_factory=dict)
    grid: np.ndarray | None = None


def load_fpe1d(data: dict) -> SetToFieldData:
    """1-D FPE: targets = stack(potential, per-gridpoint-replicated drag) (B, Nx, 2)
    (``1d_FPE/train_nio.py:43-58``)."""
    traj_stats, traj = FieldStats.standardize(np.asarray(data["trajectories"]), FPE1D_SCALES["trajectories"], (0, 1))
    pot_stats, pot = FieldStats.standardize(np.asarray(data["potential"]), FPE1D_SCALES["potential"], (0,))
    drag_raw = np.asarray(data["drag"]).reshape(-1, 1)
    drag_stats, drag = FieldStats.standardize(drag_raw, FPE1D_SCALES["drag"], (0,))
    nx = pot.shape[1]
    targets = np.stack([pot, np.repeat(drag, nx, axis=1)], axis=2)
    return SetToFieldData(traj, targets, {"traj": traj_stats, "potential": pot_stats, "drag": drag_stats})


def load_fpe2d(data: dict) -> SetToFieldData:
    """2-D FPE: targets = stack(potential, drag-field) (B, Nx, Ny, 2) (``2d_FPE/train_nio.py:43-60``)."""
    traj_stats, traj = FieldStats.standardize(np.asarray(data["trajectories"]), FPE2D_SCALES["trajectories"], (0, 1))
    pot_stats, pot = FieldStats.standardize(np.asarray(data["potential"]), FPE2D_SCALES["potential"], (0,))
    drag_stats, drag = FieldStats.standardize(np.asarray(data["drag"]), FPE2D_SCALES["drag"], (0,))
    targets = np.stack([pot, drag], axis=3)
    return SetToFieldData(traj, targets, {"traj": traj_stats, "potential": pot_stats, "drag": drag_stats})


def load_ncfpe2d(data: dict) -> SetToFieldData:
    """2-D NC FPE: targets = (Fx, Fy) (B, Nx, Ny, 2) (``2d_Non_conservative_FPE/train_nio.py:21-36``)."""
    traj_stats, traj = FieldStats.standardize(np.asarray(data["trajectories"]), NCFPE2D_SCALES["trajectories"], (0, 1))
    f_raw = np.asarray(data["F"])  # (M, 2, Nx, Ny)
    f_stats, f_norm = FieldStats.standardize(f_raw, NCFPE2D_SCALES["F"], (0,))
    targets = np.moveaxis(f_norm, 1, -1)  # (M, Nx, Ny, 2)
    return SetToFieldData(traj, targets, {"traj": traj_stats, "F": f_stats})


@dataclass
class MaxStats:
    y_max: float
    v_max: float
    g_max: float
    kappa_max: float


def load_gpe1d(data: dict, thirds: bool = True, include_gk: bool = False) -> SetToFieldData:
    """GPE/Schrodinger: global /max scaling. ``thirds=True`` uses y.max()/3, V.max()/3
    (``train_nio_GPE.py:46-57``); ``include_gk`` appends g, kappa channels
    (``train_GPE.py:25-53``, target (Nx, 3))."""
    y = np.asarray(data["y"], np.float32)
    v = np.asarray(data["V"], np.float32)
    g = np.asarray(data["g"], np.float32)
    kappa = np.asarray(data["kappa"], np.float32)
    div = 3.0 if thirds else 1.0
    y_max = float(y.max()) / div
    v_max = float(v.max()) / div
    g_max = float(g.max()) if g.max() > 0 else 1.0
    k_max = float(kappa.max()) if kappa.max() > 0 else 1.0
    y = y / y_max
    v = v / v_max
    nx = v.shape[1]
    if include_gk:
        gk = np.stack([np.repeat((g / g_max)[:, None], nx, axis=1),
                       np.repeat((kappa / k_max)[:, None], nx, axis=1)], axis=2)
        targets = np.concatenate([v[..., None], gk], axis=2)
    else:
        targets = v[..., None]
    stats = MaxStats(y_max, v_max, g_max, k_max)
    return SetToFieldData(y, targets, {"max": stats})


def train_test_split(n: int, train_frac: float = 0.8, seed: int = 0):
    """80/20 random split (reference uses torch ``random_split``; we use a seeded
    permutation — same distribution, explicitly reproducible)."""
    perm = np.random.default_rng(seed).permutation(n)
    n_train = int(train_frac * n)
    return perm[:n_train], perm[n_train:]


def epoch_batch_indices(key, n: int, batch_size: int):
    """Shuffled full-batch index array of shape (n // batch_size, batch_size)."""
    perm = jax.random.permutation(key, n)
    n_batches = n // batch_size
    return perm[: n_batches * batch_size].reshape(n_batches, batch_size)


def eval_batches(n: int, batch_size: int):
    """Index/mask pairs covering all n samples with a padded final batch."""
    out = []
    for s in range(0, n, batch_size):
        idx = np.arange(s, min(s + batch_size, n))
        mask = np.ones(batch_size, np.float32)
        if idx.shape[0] < batch_size:
            mask[idx.shape[0]:] = 0.0
            idx = np.concatenate([idx, np.zeros(batch_size - idx.shape[0], np.int64)])
        out.append((idx, mask))
    return out
