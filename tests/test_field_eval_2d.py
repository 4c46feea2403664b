"""2-D field-eval roundtrip on a toy 16x16 FPE-2D workdir (CPU).

The real fpe2d suite pins its CNN encoder to the 61x61 grid, which is too expensive to
exercise on CPU; the grid-agnostic FNO-branch model (NIOFNO2D) drives the same loader,
normalization, denormalization, metrics and figure paths at toy scale.
"""
import dataclasses
import os

import numpy as np

from blindno.data import generate as G
from blindno.suites.registry import SUITES
from blindno.train.loop import TrainConfig, train_model
from blindno.eval.field_eval import evaluate_suite_model

NM = 1e-9


def _toy_grid(n):
    gx, gy = np.meshgrid(np.linspace(-1, 1, n, dtype=np.float32),
                         np.linspace(-1, 1, n, dtype=np.float32), indexing="ij")
    return np.stack([gx, gy], axis=2)


def test_fpe2d_eval_roundtrip_toy_grid(tmp_path):
    from blindno.models.nio2d import NIOFNO2D

    spec = SUITES["fpe2d"]
    w = str(tmp_path)
    os.makedirs(os.path.join(w, "data"), exist_ok=True)
    kw = dict(n_snapshots=6, tf=2e-4, nsteps=20, extent=(160 * NM, 160 * NM), batch=4)
    np.savez(os.path.join(w, "data", spec.train_file), **G.generate_fpe2d(0, 12, **kw))
    np.savez(os.path.join(w, "data", spec.test_file), **G.generate_fpe2d(5, 4, **kw))

    model_fn = lambda: NIOFNO2D(width=4, modes=4, inner_modes=4, inner_width=2,
                                fno_layers=2, l_min=3)
    spec = dataclasses.replace(spec, grid=_toy_grid(16),
                               models={**spec.models, "mini": model_fn})

    with np.load(os.path.join(w, "data", spec.train_file), allow_pickle=True) as z:
        data = spec.loader({k: z[k] for k in z.files})
    cfg = TrainConfig(epochs=2, batch_size=4, save_interval=2,
                      ckpt_dir=os.path.join(w, "ckpt", "fpe2d_mini"))
    train_model(model_fn(), data, spec.grid, cfg)

    report = evaluate_suite_model(spec, "mini", w, batch=4)
    assert report["n_test"] == 4
    assert np.isfinite(report["mean_rel_l2_sum"])
    out_dir = os.path.join(w, "eval", "fpe2d_mini")
    preds = np.load(os.path.join(out_dir, "predictions.npy"))
    assert preds.shape == (4, 16, 16, 2)
    assert os.path.exists(os.path.join(out_dir, "metrics.csv"))
    assert os.path.exists(os.path.join(out_dir, "pred_sample_0.png"))
    # physical units restored: potential wells ~1e-20 J, drag ~1e-10 kg/s
    assert 1e-23 < np.abs(preds[..., 0]).max() < 1e-17
    assert 1e-12 < np.abs(preds[..., 1]).max() < 1e-8
