"""Single-process round-1 driver: datagen + training for every suite/model, in
priority order, inside ONE TPU client process (the axon tunnel dislikes client churn).

Touch runs/STOP to halt after the current stage. All state is resumable: datasets are
skipped if their npz exists; trainings are skipped if a summary json exists.
"""
import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

import numpy as np

W = os.environ.get("BLINDNO_WORKDIR", "/root/repo/runs")
os.makedirs(os.path.join(W, "data"), exist_ok=True)
os.makedirs(os.path.join(W, "logs"), exist_ok=True)


def log(*a):
    print(f"[{time.strftime('%H:%M:%S')}]", *a, flush=True)


def stop_requested():
    return os.path.exists(os.path.join(W, "STOP"))


def ensure_data(spec, m_train=None, m_test=None, seed=0):
    from blindno.suites.registry import SUITES  # noqa

    train_path = os.path.join(W, "data", spec.train_file)
    test_path = os.path.join(W, "data", spec.test_file)
    if not os.path.exists(train_path):
        m = m_train or spec.m_train
        log(f"datagen {spec.name} train m={m}")
        t0 = time.time()
        d = spec.datagen_train(seed, m)
        np.savez(train_path, **d)
        log(f"  done in {time.time() - t0:.0f}s -> {train_path}")
    if not os.path.exists(test_path):
        m = m_test or spec.m_test
        log(f"datagen {spec.name} test m={m}")
        t0 = time.time()
        d = spec.datagen_test(seed + 1000, m)
        np.savez(test_path, **d)
        log(f"  done in {time.time() - t0:.0f}s -> {test_path}")


def train_one(spec, model_name, epochs=None):
    from blindno.train.loop import train_model

    summary_path = os.path.join(W, "logs", f"{spec.name}_{model_name}_summary.json")
    if os.path.exists(summary_path):
        log(f"skip {spec.name}/{model_name} (summary exists)")
        return
    with np.load(os.path.join(W, "data", spec.train_file), allow_pickle=True) as z:
        data = spec.loader({k: z[k] for k in z.files})
    cfg = dataclasses.replace(
        spec.train_cfg,
        epochs=epochs or spec.train_cfg.epochs,
        ckpt_dir=os.path.join(W, "ckpt", f"{spec.name}_{model_name}"),
        log_path=os.path.join(W, "logs", f"{spec.name}_{model_name}.jsonl"),
        stop_file=os.path.join(W, "STOP"),
    )
    model = spec.models[model_name]()
    log(f"train {spec.name}/{model_name} for {cfg.epochs} epochs")
    t0 = time.time()
    res = train_model(model, data, spec.grid, cfg)
    finished = bool(res.history) and res.history[-1].get("epoch") == cfg.epochs
    log(f"  best test rel-L2 {res.best_test_loss:.6f} in {time.time() - t0:.0f}s"
        + ("" if finished else " (preempted; resumable)"))
    if finished:
        with open(summary_path, "w") as fh:
            json.dump({"suite": spec.name, "model": model_name,
                       "best_test_loss": res.best_test_loss,
                       "wall_s": time.time() - t0,
                       "history": res.history}, fh, indent=1)


def main():
    from blindno.suites.registry import SUITES

    plan = [
        ("fpe1d", "data", {}),
        ("fpe1d", "nio", {}),
        ("fpe1d", "fno", {}),
        ("fpe1d", "unet", {}),
        ("fpe2d", "data", {}),
        # fast 1-D suites before the long 2-D runs
        ("schrodinger1d", "data", {}),
        ("schrodinger1d", "nio", {}),
        ("schrodinger1d", "fno", {}),
        ("schrodinger1d", "unet", {}),
        ("gpe1d", "data", {}),
        ("gpe1d", "nio", {}),
        ("gpe1d", "fno", {}),
        ("gpe1d", "unet", {}),
        ("gpe1d_vgk", "nio", {}),
        ("fpe2d", "nio", {}),
        ("fpe2d", "fno", {}),
        ("fpe2d", "unet", {}),
        ("ncfpe2d", "data", {"m_train": 1200}),
        ("ncfpe2d", "nio", {}),
        ("ncfpe2d", "unet", {}),
        ("ncfpe2d", "fno", {}),
    ]
    for suite, item, kw in plan:
        if stop_requested():
            log("STOP requested; exiting")
            return
        spec = SUITES[suite]
        try:
            if item == "data":
                ensure_data(spec, **kw)
            else:
                ensure_data(spec)  # no-op if present
                train_one(spec, item, **kw)
        except Exception:
            log(f"STAGE FAILED: {suite}/{item}")
            traceback.print_exc()
    log("run_all complete")


if __name__ == "__main__":
    main()
