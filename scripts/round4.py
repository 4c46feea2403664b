"""Round-4 TPU queue: close the 2-D accuracy gaps with the levers built in round 3.

VERDICT r3 priorities, in value-per-hour order (single TPU client process, absolute
deadline guard, graceful runs/STOP preemption, per-stage evidence commits):

 0. profile stage (VERDICT Missing #5): component timing + trace of the bench step.
 1. fpe2d dataset regen (seed 0, bit-identical distribution; wiped mid-round-3).
 2. fpe2d/unet "aug" variant — D4 augmentation + reference-exact lr 5e-4 (registry
    defaults since round 3; no adopted fpe2d row has ever trained WITH augmentation).
 3. ncfpe2d/unet — first-ever NC BlinDNO row (m=2400 + C4 aug registry config).
 4. fpe1d/nio re-evidence — row beats ref but its checkpoint died in the host wipe.
 5. fpe2d/fno "aug" variant.
 6. ncfpe2d/fno — resume the epoch-95 m=2400+C4 run to 400 epochs.
 7. fpe2d/nio "aug" variant.
 8. ncfpe2d/nio "aug" variant (old row trained at m=1200, pre-augmentation).
 9. schrodinger1d/unet seed-2 retry (0.5 % miss; adopt-if-better).

All round-4 trainings add early_stop_patience=130: with StepLR(100, 0.5) a run whose
best has not moved in 130 epochs has seen a full LR halving without improvement; the
best checkpoint is already on disk, so stopping is free accuracy-wise and buys queue
time for the stages below it (the reference always runs the full 400 — recorded in
each summary's cfg for honesty).

Datasets are loaded once per suite and cached in-process (the 1-core host pays
~10-45 min per 6-12 GB npz load; three fpe2d stages share one load).
"""
import dataclasses
import glob
import json
import os
import shutil
import subprocess
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from run_all import W, ensure_data, log, stop_requested  # noqa: E402
from round2 import _load_rows, compose_results, eval_one  # noqa: E402
from run_eval import REFERENCE  # noqa: E402

T0 = time.time()
DEADLINE = float(os.environ.get("BLINDNO_DEADLINE", T0 + 9.4 * 3600))
ROWS = os.path.join(W, "RESULTS_rows.jsonl")
PATIENCE = 130

_DATA = {}


def deadline():
    """runs/DEADLINE (unix ts, re-read per stage so it can be moved mid-queue)
    overrides the launch-time value."""
    try:
        with open(os.path.join(W, "DEADLINE")) as fh:
            return float(fh.read().strip())
    except (OSError, ValueError):
        return DEADLINE


def remaining():
    return deadline() - time.time()


def load_data(spec):
    if spec.name not in _DATA:
        t0 = time.time()
        src = os.path.join(W, "data", spec.train_file)
        with np.load(src, allow_pickle=True) as z:
            _DATA[spec.name] = spec.loader({k: z[k] for k in z.files})
        log(f"loaded {spec.train_file} ({spec.name}) in {time.time() - t0:.0f}s")
        _warm_stats_sidecar(spec, src, _DATA[spec.name])
    return _DATA[spec.name]


def _warm_stats_sidecar(spec, src, data):
    """Write the eval-side stats sidecar from the already-loaded dataset so
    eval_one never reloads the multi-GB train archive just for normalization
    stats (field_eval.cached_train_stats contract)."""
    try:
        from blindno.eval.field_eval import TrainStats, _stats_to_arrays

        sidecar = os.path.join(W, "data", f"{spec.name}.stats.npz")
        mtime, size = os.path.getmtime(src), os.path.getsize(src)
        if os.path.exists(sidecar):
            with np.load(sidecar, allow_pickle=False) as z:
                if float(z["src_mtime"]) == mtime and int(z["src_size"]) == size:
                    return
        ts = TrainStats(data.stats, int(data.targets.shape[-1]))
        np.savez(sidecar, **_stats_to_arrays(ts, mtime, size))
        log(f"  warmed stats sidecar {sidecar}")
    except Exception:
        traceback.print_exc()


def _summary(res, cfg, suite, model, wall_s, extra=None):
    d = {"suite": suite, "model": model, "best_test_loss": res.best_test_loss,
         "wall_s": wall_s,
         "cfg": {"lr": cfg.lr, "batch_size": cfg.batch_size, "epochs": cfg.epochs,
                 "seed": cfg.seed, "augment": cfg.augment,
                 "early_stop_patience": cfg.early_stop_patience},
         "history": res.history}
    if res.history and res.history[-1]["epoch"] < cfg.epochs:
        d["epochs_trained"] = res.history[-1]["epoch"]
        d["note"] = (f"early-stopped at epoch {res.history[-1]['epoch']}/{cfg.epochs}: "
                     f"no best improvement for {cfg.early_stop_patience} epochs")
    if extra:
        d.update(extra)
    return d


def _train(spec, model_name, run_name, overrides=None):
    """Train into runs/ckpt/{run_name}; returns (res, cfg, wall_s)."""
    from blindno.train.loop import train_model

    cfg = dataclasses.replace(
        spec.train_cfg,
        ckpt_dir=os.path.join(W, "ckpt", run_name),
        log_path=os.path.join(W, "logs", f"{run_name}.jsonl"),
        stop_file=os.path.join(W, "STOP"),
        early_stop_patience=PATIENCE,
        **(overrides or {}),
    )
    model = spec.models[model_name]()
    log(f"train {run_name} for {cfg.epochs} epochs (bs {cfg.batch_size}, lr {cfg.lr}, "
        f"augment {cfg.augment}, patience {cfg.early_stop_patience})")
    t0 = time.time()
    res = train_model(model, load_data(spec), spec.grid, cfg)
    wall = time.time() - t0
    log(f"  best {res.best_test_loss:.6f} in {wall:.0f}s "
        + ("(finished)" if res.finished else "(preempted; resumable)"))
    return res, cfg, wall


def _pop_row(suite, model):
    rows = _load_rows()
    if rows.pop((suite, model), None) is not None:
        with open(ROWS, "w") as fh:
            for r in rows.values():
                fh.write(json.dumps(r) + "\n")


def commit_evidence(msg, ckpt_dirs=()):
    """Commit logs/rows/results (+ force-add best ckpts as wipe insurance)."""
    try:
        subprocess.run(["git", "add", "-A", "runs/logs", "runs/RESULTS.json",
                        "runs/RESULTS.md", "runs/RESULTS_rows.jsonl", "README.md",
                        "runs/evidence"], cwd="/root/repo", check=False,
                       capture_output=True)
        for d in ckpt_dirs:
            for best in glob.glob(os.path.join(W, "ckpt", d, "best_*")):
                subprocess.run(["git", "add", "-f", best], cwd="/root/repo",
                               check=False, capture_output=True)
        r = subprocess.run(["git", "commit", "-m", msg], cwd="/root/repo",
                           check=False, capture_output=True, text=True)
        log(f"commit: {msg} -> {r.stdout.strip().splitlines()[:1]}")
    except Exception:
        traceback.print_exc()


def stage_train(suite, model):
    """First-ever (or resumable) row at registry config; summary on finish."""
    from blindno.suites.registry import SUITES

    spec = SUITES[suite]
    summary_path = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
    if os.path.exists(summary_path):
        log(f"skip train {suite}/{model} (summary exists)")
        return
    ensure_data(spec)
    res, cfg, wall = _train(spec, model, f"{suite}_{model}")
    if res.finished:
        with open(summary_path, "w") as fh:
            json.dump(_summary(res, cfg, suite, model, wall), fh, indent=1)


def stage_variant(suite, model, tag, overrides=None):
    """Adopt-if-better retrain (round3 contract: also adopt when the incumbent
    checkpoint is gone — a slightly different row WITH an artifact beats a row
    without one)."""
    from blindno.suites.registry import SUITES

    spec = SUITES[suite]
    summary_path = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
    old_best = float("inf")
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            old_best = json.load(fh)["best_test_loss"]
    ref = REFERENCE.get((suite, model))
    if ref is not None and old_best <= ref:
        log(f"skip variant {suite}/{model}:{tag} (already beats ref {old_best:.6f})")
        return
    run = f"{suite}_{model}_{tag}"
    done_marker = os.path.join(W, "logs", f"{run}_done.json")
    if os.path.exists(done_marker):
        log(f"skip variant {run} (done marker)")
        return
    ensure_data(spec)
    res, cfg, wall = _train(spec, model, run, overrides)
    if not res.finished:
        return
    main_dir = os.path.join(W, "ckpt", f"{suite}_{model}")
    adopt = res.best_test_loss < old_best or not os.path.isdir(main_dir)
    if adopt:
        extra = {"variant": tag}
        if not res.best_test_loss < old_best:
            extra["prewipe_best"] = old_best
            log(f"  adopting {tag} despite {res.best_test_loss:.6f} >= "
                f"{old_best:.6f}: incumbent checkpoint lost in host wipe")
        shutil.rmtree(main_dir, ignore_errors=True)
        shutil.move(cfg.ckpt_dir, main_dir)
        with open(summary_path, "w") as fh:
            json.dump(_summary(res, cfg, suite, model, wall, extra), fh, indent=1)
        _pop_row(suite, model)
        log(f"  adopted variant {tag} for {suite}/{model}")
    else:
        shutil.rmtree(cfg.ckpt_dir, ignore_errors=True)
        log(f"  discarded variant {tag} ({res.best_test_loss:.6f} >= {old_best:.6f})")
    with open(done_marker, "w") as fh:
        json.dump({"best": res.best_test_loss, "old": old_best, "adopted": adopt}, fh)


def stage_reevidence(suite, model):
    """Identical-config rerun for a row whose checkpoint died in the host wipe.

    Reuses the wiped row's recorded seed (an adopted row may have come from a
    seed-retry variant — e.g. schrodinger1d/unet's 0.038363 is a seed-1 run, and
    a default-seed rerun would overwrite it with a worse row)."""
    from blindno.suites.registry import SUITES

    spec = SUITES[suite]
    summary_path = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
    if os.path.isdir(os.path.join(W, "ckpt", f"{suite}_{model}")):
        log(f"skip re-evidence {suite}/{model} (checkpoint exists)")
        return
    overrides = None
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            old_cfg = json.load(fh).get("cfg", {})
        if "seed" in old_cfg:
            overrides = {"seed": old_cfg["seed"]}
        os.replace(summary_path,
                   os.path.join(W, "logs", f"{suite}_{model}_summary_prewipe.json"))
    rows = _load_rows()
    old = rows.pop((suite, model), None)
    if old is not None:
        with open(os.path.join(W, "logs", f"{suite}_{model}_row_prewipe.json"), "w") as fh:
            json.dump(old, fh)
        with open(ROWS, "w") as fh:
            for r in rows.values():
                fh.write(json.dumps(r) + "\n")
    ensure_data(spec)
    res, cfg, wall = _train(spec, model, f"{suite}_{model}", overrides)
    if res.finished:
        with open(summary_path, "w") as fh:
            json.dump(_summary(res, cfg, suite, model, wall), fh, indent=1)


def stage_retry(suite, model, seed):
    """Fresh-seed retry adopted only if it beats the recorded best."""
    from blindno.suites.registry import SUITES

    summary_path = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
    old_best = float("inf")
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            old_best = json.load(fh)["best_test_loss"]
    ref = REFERENCE.get((suite, model))
    if ref is not None and old_best <= ref:
        log(f"skip retry {suite}/{model} (beats ref)")
        return
    stage_variant(suite, model, f"s{seed}", {"seed": seed})


def stage_leakdemo():
    """Falsification experiment for docs/fpe2d_gap_analysis.md §4: reproduce the
    hypothesized reference pipeline (train archive with duplicated simulations +
    random 80/20 split) and record what 'test' rel-L2 it yields.

    Build: first 2000 samples of the seed-0 fpe2d train archive, tiled x4 into an
    m=8000 archive (e.g. four concatenated same-seed generation runs). The loader
    standardizes and the train loop 80/20-splits as usual, so ~99%% of test
    samples have an exact twin in train (1 - 0.2^3). Train the UNet with the
    registry config minus augmentation (the reference trains unaugmented).
    Prediction (gap analysis 3a): split-test collapses from the honest 0.2057
    to ~0.04-0.06, i.e. to the reference's published 0.038817.
    NOT a RESULTS row — summary goes to fpe2d_unet_leakdemo_summary.json only.
    """
    from blindno.suites.registry import SUITES

    spec = SUITES["fpe2d"]
    summary_path = os.path.join(W, "logs", "fpe2d_unet_leakdemo_summary.json")
    if os.path.exists(summary_path):
        log("skip leakdemo (summary exists)")
        return
    ensure_data(spec)
    demo = "fpe2d_leak"
    if demo not in _DATA:
        t0 = time.time()
        src = os.path.join(W, "data", spec.train_file)
        with np.load(src, allow_pickle=True) as z:
            raw = {k: z[k][:2000] for k in z.files}
        raw = {k: np.concatenate([v, v, v, v], axis=0) for k, v in raw.items()}
        _DATA[demo] = spec.loader(raw)
        del raw
        log(f"built leaked archive (2000 unique x4) in {time.time() - t0:.0f}s")
    from blindno.train.loop import train_model

    cfg = dataclasses.replace(
        spec.train_cfg,
        augment=None,
        ckpt_dir=os.path.join(W, "ckpt", "fpe2d_unet_leakdemo"),
        log_path=os.path.join(W, "logs", "fpe2d_unet_leakdemo.jsonl"),
        stop_file=os.path.join(W, "STOP"),
        early_stop_patience=PATIENCE,
    )
    model = spec.models["unet"]()
    log(f"train fpe2d_unet_leakdemo for {cfg.epochs} epochs (bs {cfg.batch_size}, "
        f"lr {cfg.lr}, augment OFF, duplicated archive)")
    t0 = time.time()
    res = train_model(model, _DATA[demo], spec.grid, cfg)
    wall = time.time() - t0
    log(f"  leakdemo best split-test {res.best_test_loss:.6f} in {wall:.0f}s "
        + ("(finished)" if res.finished else "(preempted)"))
    # summary written even when preempted: the curve is the evidence
    d = _summary(res, cfg, "fpe2d", "unet_leakdemo", wall,
                 {"experiment": "duplicate-and-split leakage demo",
                  "finished": res.finished,
                  "unique_samples": 2000, "tile": 4,
                  "honest_row_same_config": 0.2057,
                  "reference_published_test": 0.038817})
    with open(summary_path, "w") as fh:
        json.dump(d, fh, indent=1)


def stage_bf16val():
    """Accuracy validation for TrainConfig.compute_dtype='bfloat16' (the HBM-bandwidth
    lever named by profile_r04_analysis.md): train fpe1d/nio at the identical registry
    config, bf16 compute, and record the best test loss next to the f32 row's. NOT a
    RESULTS row — this is the evidence gate for whether the bf16 mode may become the
    benchmarked default (BASELINE.md reconciliation)."""
    from blindno.suites.registry import SUITES

    suite, model = "fpe1d", "nio"
    spec = SUITES[suite]
    summary_path = os.path.join(W, "logs", f"{suite}_{model}_bf16val_summary.json")
    if os.path.exists(summary_path):
        log("skip bf16val (summary exists)")
        return
    ensure_data(spec)
    res, cfg, wall = _train(spec, model, f"{suite}_{model}_bf16val",
                            {"compute_dtype": "bfloat16"})
    if not res.finished:
        return
    f32_best = None
    f32_summary = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
    if os.path.exists(f32_summary):
        with open(f32_summary) as fh:
            f32_best = json.load(fh)["best_test_loss"]
    d = _summary(res, cfg, suite, f"{model}_bf16val", wall,
                 {"experiment": "compute_dtype=bfloat16 accuracy validation",
                  "compute_dtype": "bfloat16", "f32_row_best": f32_best})
    with open(summary_path, "w") as fh:
        json.dump(d, fh, indent=1)
    log(f"  bf16val best {res.best_test_loss:.6f} vs f32 row {f32_best}")


def stage_profile():
    out = "/root/repo/runs/logs/profile_r04.json"
    if os.path.exists(out):
        log("skip profile (exists)")
        return
    import profile_step

    profile_step.main()


def stage_data(suite):
    from blindno.suites.registry import SUITES

    ensure_data(SUITES[suite])


# (fn, args, est_cost_s, name). est includes datagen/load where the stage pays it.
# Tail (post second wipe, which took every checkpoint on the host): re-evidence
# retrains for all remaining rows, grouped by suite so the in-process dataset
# cache is reused. First-of-suite ests include the 1-D dataset regen.
PLAN = [
    # Session-5 reorder (all stages idempotent; done ones self-skip): the only
    # fully-missing RESULTS row first, then the cheap evidence-durability
    # retrains, then the long 2-D aug variants (which double as re-evidence for
    # rows whose incumbent checkpoints died in the wipe), then the perf lever.
    (stage_train, ("ncfpe2d", "fno"), 8600, "ncfpe2d/fno"),
    (stage_reevidence, ("gpe1d", "unet"), 1200, "gpe1d/unet re-evidence"),
    (stage_reevidence, ("schrodinger1d", "nio"), 2400, "schrodinger1d/nio re-evidence"),
    (stage_reevidence, ("schrodinger1d", "unet"), 2100, "schrodinger1d/unet re-evidence"),
    (stage_reevidence, ("gpe1d_vgk", "nio"), 2600, "gpe1d_vgk/nio re-evidence"),
    # Session-7 reorder (post third wipe): bf16val before the long 2-D variants —
    # it gates whether the bench headline may adopt compute_dtype=bfloat16
    # (BASELINE.md contract), so it must land with an idle-TPU window to spare.
    # no (suite, model) string args on purpose: its summary must not trigger the
    # post-stage eval_one/compose of the f32 fpe1d/nio row
    (stage_bf16val, (), 2400, "fpe1d/nio bf16 validation"),
    (stage_variant, ("ncfpe2d", "nio", "aug"), 10000, "ncfpe2d/nio aug"),
    (stage_variant, ("fpe2d", "fno", "aug"), 13000, "fpe2d/fno aug"),
    (stage_variant, ("fpe2d", "nio", "aug"), 10500, "fpe2d/nio aug"),
    (stage_profile, (), 900, "profile"),
    (stage_data, ("fpe2d",), 3900, "fpe2d data"),
    (stage_variant, ("fpe2d", "unet", "aug"), 10000, "fpe2d/unet aug"),
    (stage_train, ("ncfpe2d", "unet"), 7000, "ncfpe2d/unet"),
    (stage_reevidence, ("fpe1d", "nio"), 2400, "fpe1d/nio re-evidence"),
    # est is deliberately below the full-run cost: the stage records its summary
    # and best ckpt even when STOP/deadline-preempted, and the collapse signature
    # shows by epoch ~100, so a partial window still yields the evidence.
    (stage_leakdemo, (), 4500, "fpe2d leakage demo"),
    (stage_retry, ("schrodinger1d", "unet", 2), 2200, "schrodinger1d/unet s2"),
    (stage_reevidence, ("fpe1d", "fno"), 1600, "fpe1d/fno re-evidence"),
    (stage_reevidence, ("fpe1d", "unet"), 2300, "fpe1d/unet re-evidence"),
    (stage_reevidence, ("gpe1d", "nio"), 2200, "gpe1d/nio re-evidence"),
    (stage_reevidence, ("gpe1d", "fno"), 900, "gpe1d/fno re-evidence"),
    (stage_reevidence, ("schrodinger1d", "fno"), 800, "schrodinger1d/fno re-evidence"),
]


def run_pass():
    """One priority-ordered pass over PLAN. Returns seconds spent doing work."""
    t_pass = time.time()
    for fn, args, est, name in PLAN:
        if stop_requested():
            log("STOP requested; exiting pass")
            break
        if remaining() < est:
            log(f"skip {name}: {remaining():.0f}s left < est {est}s")
            continue
        suite_model = [a for a in args if isinstance(a, str)][:2]
        try:
            t0 = time.time()
            fn(*args)
            log(f"stage {name} done in {time.time() - t0:.0f}s")
        except Exception:
            log(f"STAGE FAILED: {name}")
            traceback.print_exc()
            continue
        if time.time() - t0 < 60:
            continue  # stage skipped internally; no eval/commit churn
        try:
            if len(suite_model) == 2 and fn is not stage_data:
                suite, model = suite_model
                if os.path.exists(os.path.join(W, "logs", f"{suite}_{model}_summary.json")):
                    eval_one(suite, model)
                    compose_results()
                    subprocess.run([sys.executable, "scripts/update_readme_results.py"],
                                   cwd="/root/repo", check=False, capture_output=True)
                commit_evidence(f"round4: {name} evidence", [f"{suite}_{model}"])
            else:
                commit_evidence(f"round4: {name}")
        except Exception:
            log(f"EVAL/COMMIT FAILED: {name}")
            traceback.print_exc()
    return time.time() - t_pass


def main():
    log(f"round4 queue start; deadline in {remaining()/3600:.2f}h")
    # Multi-pass: early stops can buy back hours, so a stage skipped on pass N
    # (est > remaining at its turn) may fit on pass N+1. Stages are idempotent
    # (summary / done-marker / ckpt-dir guards), and a pass that does <120s of
    # work means nothing is left that fits.
    while not stop_requested():
        spent = run_pass()
        if spent < 120:
            break
    compose_results()
    commit_evidence("round4: queue final compose")
    log("round4 queue complete")


if __name__ == "__main__":
    main()
