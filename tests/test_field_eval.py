"""End-to-end field evaluation roundtrip on a tiny 1D FPE workdir (CPU)."""
import dataclasses
import json
import os

import numpy as np

from blindno.data import generate as G
from blindno.suites.registry import SUITES
from blindno.train.loop import TrainConfig, train_model
from blindno.eval.field_eval import evaluate_suite_model
from blindno.eval.time_error import time_error_suite


def _mini_spec(tmp_path):
    spec = SUITES["fpe1d"]
    w = str(tmp_path)
    os.makedirs(os.path.join(w, "data"), exist_ok=True)
    np.savez(os.path.join(w, "data", spec.train_file), **G.generate_fpe1d(0, 24, n_snapshots=8, nsteps=30))
    np.savez(os.path.join(w, "data", spec.test_file), **G.generate_fpe1d(7, 6, n_snapshots=8, nsteps=30))
    return spec, w


def test_eval_and_time_error_roundtrip(tmp_path):
    spec, w = _mini_spec(tmp_path)
    from blindno.models.nio1d import NIOFP1D

    model_fn = lambda: NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    spec = dataclasses.replace(spec, models={**spec.models, "mini": model_fn})

    with np.load(os.path.join(w, "data", spec.train_file), allow_pickle=True) as z:
        data = spec.loader({k: z[k] for k in z.files})
    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=2,
                      ckpt_dir=os.path.join(w, "ckpt", "fpe1d_mini"))
    train_model(model_fn(), data, spec.grid, cfg)

    report = evaluate_suite_model(spec, "mini", w, batch=4)
    assert report["n_test"] == 6
    assert np.isfinite(report["mean_rel_l2_sum"])
    out_dir = os.path.join(w, "eval", "fpe1d_mini")
    assert os.path.exists(os.path.join(out_dir, "metrics.csv"))
    assert os.path.exists(os.path.join(out_dir, "predictions.npy"))
    preds = np.load(os.path.join(out_dir, "predictions.npy"))
    assert preds.shape == (6, 80, 2)
    # physical units restored: potential magnitudes ~1e-20 J wells
    assert 1e-22 < np.abs(preds[..., 0]).max() < 1e-18

    te = time_error_suite(spec, "mini", w, num_samples=3)
    assert te["num_samples"] == 3
    assert 0 <= te["mean_err_l2"] < 10
