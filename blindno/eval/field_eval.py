"""Field-space evaluation: load best checkpoint, predict coefficient fields on the
test set, denormalize, write per-sample metrics + predictions + figures.

Re-design of the reference's ``eval_{nio,fno,unet}*.py`` family (robust ckpt loading,
per-sample rel-L2 ``metrics.csv``, denormalized ``.npy`` predictions, comparison PNGs —
``2d_FPE/eval_nio.py:105-283``, ``1d_FPE/eval_nio.py:123-197``). Here eval inputs are
normalized with the *train-set* statistics recomputed from the train archive, exactly
like ``compute_train_stats`` (``1d_FPE/compute_time_error.py:55-94``).
"""
from __future__ import annotations

import csv
import os
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from blindno.data.datasets import FieldStats, MaxStats
from blindno.eval.metrics import relative_l2_per_field
from blindno.train.checkpoint import load_best


_NPZ_CACHE: dict = {}


def _load_npz(path):
    """Memoized archive load. With train statistics coming from the sidecar cache
    (``cached_train_stats``) only TEST archives (<= ~3 GB) pass through here; keep two
    entries with LRU eviction and hand out read-only arrays so a mutating caller can't
    corrupt a later eval."""
    key = (path, os.path.getmtime(path))
    if key in _NPZ_CACHE:
        _NPZ_CACHE[key] = _NPZ_CACHE.pop(key)  # move to end: LRU on hit
        return _NPZ_CACHE[key]
    while len(_NPZ_CACHE) >= 2:
        _NPZ_CACHE.pop(next(iter(_NPZ_CACHE)))
    with np.load(path, allow_pickle=True) as z:
        entry = {k: z[k] for k in z.files}
    for arr in entry.values():
        arr.flags.writeable = False
    _NPZ_CACHE[key] = entry
    return entry


@dataclass
class TrainStats:
    """The two things eval needs from a train archive: normalization statistics and
    the target field count — a few KB, vs the ~12 GB fpe2d archive they come from."""

    stats: dict
    n_fields: int


def cached_train_stats(spec, workdir: str) -> TrainStats:
    """Train-set normalization stats from a sidecar npz next to the train archive.

    Each 2-D (field-eval, time-error) pass previously reloaded the full train archive
    (~17 min for fpe2d) just to recompute per-gridpoint means/stds. The sidecar is
    keyed on the archive's (mtime, size), so regenerating a dataset invalidates it.
    """
    src = os.path.join(workdir, "data", spec.train_file)
    # keyed by SUITE, not just file: gpe1d and gpe1d_vgk share one archive but load
    # it with different normalization (thirds vs plain /max, 1 vs 3 target fields)
    sidecar = os.path.join(workdir, "data", f"{spec.name}.stats.npz")
    mtime, size = os.path.getmtime(src), os.path.getsize(src)
    if os.path.exists(sidecar):
        with np.load(sidecar, allow_pickle=False) as z:
            if float(z["src_mtime"]) == mtime and int(z["src_size"]) == size:
                return _stats_from_arrays({k: z[k] for k in z.files})
    train_ds = spec.loader(_load_full_npz(src))
    ts = TrainStats(train_ds.stats, int(train_ds.targets.shape[-1]))
    np.savez(sidecar, **_stats_to_arrays(ts, mtime, size))
    return ts


def _load_full_npz(path):
    """One-shot uncached load (train archives are too large for _NPZ_CACHE)."""
    with np.load(path, allow_pickle=True) as z:
        return {k: z[k] for k in z.files}


def _stats_to_arrays(ts: TrainStats, mtime: float, size: int) -> dict:
    out = {"src_mtime": np.float64(mtime), "src_size": np.int64(size),
           "n_fields": np.int64(ts.n_fields)}
    for name, s in ts.stats.items():
        if isinstance(s, MaxStats):
            out[f"max__{name}"] = np.array([s.y_max, s.v_max, s.g_max, s.kappa_max])
        else:
            out[f"scale__{name}"] = np.float64(s.scale)
            out[f"mean__{name}"] = s.mean
            out[f"std__{name}"] = s.std
    return out


def _stats_from_arrays(arrs: dict) -> TrainStats:
    stats = {}
    for k, v in arrs.items():
        if k.startswith("max__"):
            stats[k[5:]] = MaxStats(*(float(x) for x in v))
        elif k.startswith("scale__"):
            name = k[7:]
            stats[name] = FieldStats(float(v), arrs[f"mean__{name}"], arrs[f"std__{name}"])
    return TrainStats(stats, int(arrs["n_fields"]))


def predict_fields(model, params, batch_stats, inputs_norm, grid, batch: int = 16):
    """Batched eval-mode forward: inputs_norm (M, L, *grid) -> (M, *grid, F)."""

    @jax.jit
    def fwd(xb):
        return model.apply({"params": params, "batch_stats": batch_stats}, xb, grid, training=False)

    outs = []
    for s in range(0, inputs_norm.shape[0], batch):
        outs.append(np.asarray(fwd(jnp.asarray(inputs_norm[s : s + batch]))))
    return np.concatenate(outs)


def tta_indices(kind: str):
    """Inverse-element index per group element of ``make_augment(kind)``.

    D4 element i<4 is the rotation r^i (inverse r^{(4-i)%4}); i>=4 is the
    reflection r^k s, an involution (its own inverse). C4: (4-i)%4. flip1d:
    both elements are involutions.
    """
    if kind == "flip1d":
        return [0, 1]
    if kind == "c4_vector":
        return [(4 - i) % 4 for i in range(4)]
    if kind == "d4_scalar":
        return [(4 - i) % 4 if i < 4 else i for i in range(8)]
    # mirror make_augment's strictness: a new augment kind with a different element
    # ordering must register its inverse table here, not inherit the D4 one
    raise ValueError(f"unknown augment kind: {kind!r}")


def predict_fields_tta(model, params, batch_stats, inputs_norm, grid, kind: str,
                       batch: int = 16):
    """Symmetry test-time ensembling: average T_i^{-1}(model(T_i(x))) over the
    group used for training augmentation (TrainConfig.augment). Valid for the same
    reason the training augmentation is: every T_i(x) is a population-level draw
    from the same distribution and the canonical prediction is the inverse-
    transformed output (per-gridpoint empirical normalization stats commute with
    the group only up to finite-sample noise; see TrainConfig.augment)."""
    from blindno.train.loop import make_augment

    fns = make_augment(kind)
    inv = tta_indices(kind)

    @jax.jit
    def fwd_all(xb):
        # 2 channels: the c4 vector rule indexes components 0 and 1
        dummy_y = jnp.zeros(xb.shape[:1] + xb.shape[2:] + (2,), xb.dtype)
        outs = []
        for i, f in enumerate(fns):
            xt, _ = f(xb, dummy_y)
            out = model.apply({"params": params, "batch_stats": batch_stats}, xt,
                              grid, training=False)
            dummy_x = jnp.zeros_like(xb)
            _, out_canon = fns[inv[i]](dummy_x, out)
            outs.append(out_canon)
        return jnp.mean(jnp.stack(outs), axis=0)

    outs = []
    for s in range(0, inputs_norm.shape[0], batch):
        outs.append(np.asarray(fwd_all(jnp.asarray(inputs_norm[s : s + batch]))))
    return np.concatenate(outs)


def evaluate_suite_model(spec, model_name: str, workdir: str, batch: int = 16,
                         save_predictions: bool = True, make_figures: bool = True):
    """Returns a report dict; writes metrics.csv / preds / PNGs under
    ``{workdir}/eval/{suite}_{model}/``."""
    train_ds = cached_train_stats(spec, workdir)
    test = _load_npz(os.path.join(workdir, "data", spec.test_file))
    # normalize test inputs with train stats
    if "max" in train_ds.stats:  # GPE suites: global /max
        inputs = np.asarray(test["y"], np.float32) / train_ds.stats["max"].y_max
    else:
        inputs = train_ds.stats["traj"].normalize(np.asarray(test["trajectories"]))

    ckpt = load_best(os.path.join(workdir, "ckpt", f"{spec.name}_{model_name}"))
    model = spec.models[model_name]()
    preds_norm = predict_fields(model, ckpt["params"], ckpt["batch_stats"], inputs,
                                jnp.asarray(spec.grid), batch)

    out_dir = os.path.join(workdir, "eval", f"{spec.name}_{model_name}")
    os.makedirs(out_dir, exist_ok=True)

    # normalized-space per-sample metrics against the test targets
    test_ds = _normalized_test_targets(spec, train_ds, test)
    errs = np.asarray(
        relative_l2_per_field(jnp.asarray(preds_norm), jnp.asarray(test_ds), True)
    )  # (M, F)
    with open(os.path.join(out_dir, "metrics.csv"), "w", newline="") as fh:
        w = csv.writer(fh)
        w.writerow(["sample"] + [f"rel_l2_field{i}" for i in range(errs.shape[1])] + ["sum"])
        for i, row in enumerate(errs):
            w.writerow([i] + [f"{v:.6f}" for v in row] + [f"{row.sum():.6f}"])

    preds_phys = denormalize_predictions(spec, train_ds, preds_norm)
    if save_predictions:
        np.save(os.path.join(out_dir, "predictions.npy"), preds_phys)
    if make_figures:
        try:
            _figures(spec, out_dir, preds_phys, test)
        except Exception as e:  # figures are best-effort
            print(f"figure generation failed: {e}")

    report = {
        "suite": spec.name,
        "model": model_name,
        "n_test": int(errs.shape[0]),
        "mean_rel_l2_per_field": errs.mean(axis=0).tolist(),
        "mean_rel_l2_sum": float(errs.sum(axis=1).mean()),
        "ckpt_epoch": int(ckpt.get("epoch", -1)),
        "ckpt_test_loss": float(ckpt.get("test_loss", float("nan"))),
    }
    # symmetry test-time ensembling for augmentation-trained suites — reported as an
    # EXTRA column; the headline metrics above stay the plain single-pass numbers
    aug_kind = getattr(getattr(spec, "train_cfg", None), "augment", None)
    if aug_kind:
        preds_tta = predict_fields_tta(model, ckpt["params"], ckpt["batch_stats"],
                                       inputs, jnp.asarray(spec.grid), aug_kind, batch)
        errs_tta = np.asarray(
            relative_l2_per_field(jnp.asarray(preds_tta), jnp.asarray(test_ds), True))
        report["mean_rel_l2_per_field_tta"] = errs_tta.mean(axis=0).tolist()
        report["mean_rel_l2_sum_tta"] = float(errs_tta.sum(axis=1).mean())
    return report


def _normalized_test_targets(spec, train_ds: TrainStats, test):
    """Normalize the raw test targets with train statistics, shaped like model output."""
    if "max" in train_ds.stats:
        stats = train_ds.stats["max"]
        v = np.asarray(test["V"], np.float32) / stats.v_max
        if train_ds.n_fields == 3:
            nx = v.shape[1]
            g = np.asarray(test["g"], np.float32) / stats.g_max
            k = np.asarray(test["kappa"], np.float32) / stats.kappa_max
            return np.concatenate(
                [v[..., None], np.repeat(g[:, None, None], nx, 1), np.repeat(k[:, None, None], nx, 1)],
                axis=2,
            )
        return v[..., None]
    stats = train_ds.stats
    if "F" in stats:
        f = stats["F"].normalize(np.asarray(test["F"]))
        return np.moveaxis(f, 1, -1)
    pot = stats["potential"].normalize(np.asarray(test["potential"]))
    if pot.ndim == 2:  # 1D: replicate scalar drag across the grid
        drag = stats["drag"].normalize(np.asarray(test["drag"]).reshape(-1, 1))
        return np.stack([pot, np.repeat(drag, pot.shape[1], axis=1)], axis=2)
    drag = stats["drag"].normalize(np.asarray(test["drag"]))
    return np.stack([pot, drag], axis=3)


def denormalize_predictions(spec, train_ds: TrainStats, preds_norm):
    """Model-output space -> physical units, per suite convention."""
    if "max" in train_ds.stats:
        stats = train_ds.stats["max"]
        out = preds_norm.copy()
        out[..., 0] *= stats.v_max
        if out.shape[-1] == 3:
            out[..., 1] *= stats.g_max
            out[..., 2] *= stats.kappa_max
        return out
    stats = train_ds.stats
    if "F" in stats:
        f = np.asarray(stats["F"].denormalize(np.moveaxis(preds_norm, -1, 1)))
        return np.moveaxis(f, 1, -1)  # keep channel-last like the model output
    out = np.empty_like(preds_norm)
    out[..., 0] = np.asarray(stats["potential"].denormalize(preds_norm[..., 0]))
    if preds_norm[..., 1].ndim == 2:  # 1D (M, Nx)
        drag_per_point = preds_norm[..., 1]
        drag_scalar = drag_per_point.mean(axis=1, keepdims=True)
        out[..., 1] = np.asarray(stats["drag"].denormalize(drag_scalar)) * np.ones_like(drag_per_point)
    else:
        out[..., 1] = np.asarray(stats["drag"].denormalize(preds_norm[..., 1]))
    return out


def _figures(spec, out_dir, preds_phys, test, n_plots: int = 3):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    for i in range(min(n_plots, preds_phys.shape[0])):
        if preds_phys.ndim == 3:  # 1D suites
            fig, axes = plt.subplots(1, preds_phys.shape[-1], figsize=(5 * preds_phys.shape[-1], 4))
            axes = np.atleast_1d(axes)
            truth0 = test["potential"][i] if "potential" in test else test["V"][i]
            axes[0].plot(truth0, label="true")
            axes[0].plot(preds_phys[i, :, 0], "--", label="pred")
            axes[0].set_title("field 0")
            axes[0].legend()
            for f in range(1, preds_phys.shape[-1]):
                axes[f].plot(preds_phys[i, :, f], "--", label="pred")
                axes[f].set_title(f"field {f}")
        else:  # 2D suites
            n_f = preds_phys.shape[-1] if preds_phys.ndim == 4 else 2
            fig, axes = plt.subplots(2, n_f, figsize=(5 * n_f, 8))
            if "potential" in test:
                truths = [test["potential"][i], test["drag"][i]]
            else:
                truths = [test["F"][i, 0], test["F"][i, 1]]
            for f in range(n_f):
                axes[0, f].imshow(truths[f], origin="lower")
                axes[0, f].set_title(f"true field {f}")
                pred_f = preds_phys[i, ..., f] if preds_phys.ndim == 4 else preds_phys[i, f]
                axes[1, f].imshow(pred_f, origin="lower")
                axes[1, f].set_title(f"pred field {f}")
        fig.tight_layout()
        fig.savefig(os.path.join(out_dir, f"pred_sample_{i}.png"), dpi=100)
        plt.close(fig)
