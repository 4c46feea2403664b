"""Round-2 master driver: regenerate every dataset, retrain every (suite x model),
and evaluate each model IMMEDIATELY after its training so results land incrementally.

Round-2 context: the round-1 runs/ artifacts (datasets + checkpoints) were not carried
over, so every suite retrains from scratch; fpe2d is upsized to m=8000 (round-1
finding: m=2000 plateaus far above the reference accuracy) and the NC suite runs
end-to-end for the first time (VERDICT r1 "Next round" #2-#5).

One TPU process (the axon tunnel is single-client), resumable at every level:
- datasets are skipped when their npz exists
- trainings skip when a summary json exists; preempted runs resume from resume.msgpack
- per-model eval rows append to runs/RESULTS_rows.jsonl and are skipped when present
- touch runs/STOP for graceful preemption (honored per epoch and between stages)

Priority order: fpe2d (the single biggest round-1 parity hole) is interleaved with the
quick fpe1d retrains; the NC suite follows; the remaining 1-D suites close it out.
"""
import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

from run_all import W, ensure_data, log, stop_requested, train_one  # noqa: E402
from run_eval import REFERENCE  # noqa: E402

ROWS = os.path.join(W, "RESULTS_rows.jsonl")


def _load_rows():
    rows = {}
    if os.path.exists(ROWS):
        with open(ROWS) as fh:
            for line in fh:
                if line.strip():
                    r = json.loads(line)
                    rows[(r["suite"], r["model"])] = r
    return rows


def eval_one(suite: str, model: str):
    """Field eval + time-error for one trained model; appends a RESULTS row."""
    from blindno.suites.registry import SUITES
    from blindno.eval.field_eval import evaluate_suite_model
    from blindno.eval.time_error import time_error_suite

    if (suite, model) in _load_rows():
        log(f"skip eval {suite}/{model} (row exists)")
        return
    ckpt_dir = os.path.join(W, "ckpt", f"{suite}_{model}")
    if not os.path.isdir(ckpt_dir):
        log(f"skip eval {suite}/{model} (no checkpoint)")
        return
    spec = SUITES[suite]
    row = {"suite": suite, "model": model}
    try:
        t0 = time.time()
        rep = evaluate_suite_model(spec, model, W)
        row.update(field_rel_l2=rep["mean_rel_l2_per_field"],
                   rel_l2_sum=rep["mean_rel_l2_sum"],
                   best_ckpt_test_loss=rep["ckpt_test_loss"],
                   eval_s=round(time.time() - t0, 1))
        if "mean_rel_l2_sum_tta" in rep:  # symmetry test-time ensembling (extra column)
            row.update(field_rel_l2_tta=rep["mean_rel_l2_per_field_tta"],
                       rel_l2_sum_tta=rep["mean_rel_l2_sum_tta"])
    except Exception:
        traceback.print_exc()
        row["field_eval_error"] = True
    try:
        t0 = time.time()
        te = time_error_suite(spec, model, W, num_samples=100)
        row.update(time_err_mean=te["mean_err_l2"], time_err_std=te["std_err_l2"],
                   time_err_s=round(time.time() - t0, 1))
    except Exception:
        traceback.print_exc()
        row["time_error_error"] = True
    ref = REFERENCE.get((suite, model))
    if ref is not None:
        row["reference_rel_l2"] = ref
    with open(ROWS, "a") as fh:
        fh.write(json.dumps(row) + "\n")
    log(f"eval row {suite}/{model}: {json.dumps(row)}")


def compose_results():
    """Write runs/RESULTS.{json,md} from the accumulated rows."""
    order = list(REFERENCE) + [("gpe1d_vgk", "nio")]
    rows = _load_rows()
    results = [rows[k] for k in order if k in rows]
    results += [r for k, r in rows.items() if k not in order]
    with open(os.path.join(W, "RESULTS.json"), "w") as fh:
        json.dump(results, fh, indent=1)
    lines = [
        "# RESULTS — blindno-tpu vs reference",
        "",
        "| Suite | Model | best ckpt test rel-L2 (sum) | reference | time-err mean+-std |",
        "|---|---|---|---|---|",
    ]
    for e in results:
        ref = e.get("reference_rel_l2")
        te = (f"{e['time_err_mean']:.4f}+-{e['time_err_std']:.4f}"
              if "time_err_mean" in e else "-")
        lines.append(
            f"| {e['suite']} | {e['model']} | "
            f"{e.get('best_ckpt_test_loss', float('nan')):.6f} | "
            f"{ref if ref is not None else '-'} | {te} |")
    with open(os.path.join(W, "RESULTS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    log("composed RESULTS.json / RESULTS.md")


def retrain_if_better(suite: str, model: str, seed: int):
    """Fresh-seed retry adopted only if it beats the recorded best (VERDICT weak #7)."""
    import shutil

    from blindno.suites.registry import SUITES
    from blindno.train.loop import train_model

    spec = SUITES[suite]
    summary_path = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
    old_best = float("inf")
    if os.path.exists(summary_path):
        with open(summary_path) as fh:
            old_best = json.load(fh)["best_test_loss"]
    ref = REFERENCE.get((suite, model))
    if ref is not None and old_best <= ref:
        log(f"skip retry {suite}/{model} (already beats reference: {old_best:.6f} <= {ref})")
        return
    tag = f"{suite}_{model}_s{seed}"
    done_marker = os.path.join(W, "logs", f"{tag}_done.json")
    if os.path.exists(done_marker):
        log(f"skip retry {tag} (done marker exists)")
        return
    with np.load(os.path.join(W, "data", spec.train_file), allow_pickle=True) as z:
        data = spec.loader({k: z[k] for k in z.files})
    cfg = dataclasses.replace(
        spec.train_cfg, seed=seed,
        ckpt_dir=os.path.join(W, "ckpt", tag),
        log_path=os.path.join(W, "logs", f"{tag}.jsonl"),
        stop_file=os.path.join(W, "STOP"))
    log(f"retry {tag} for {cfg.epochs} epochs (to beat {old_best:.6f})")
    t0 = time.time()
    res = train_model(spec.models[model](), data, spec.grid, cfg)
    finished = bool(res.history) and res.history[-1].get("epoch") == cfg.epochs
    log(f"  retry best {res.best_test_loss:.6f} vs old {old_best:.6f} "
        f"({time.time() - t0:.0f}s)" + ("" if finished else " (preempted)"))
    if not finished:
        return
    if res.best_test_loss < old_best:
        main_dir = os.path.join(W, "ckpt", f"{suite}_{model}")
        shutil.rmtree(main_dir, ignore_errors=True)
        shutil.move(cfg.ckpt_dir, main_dir)
        with open(summary_path, "w") as fh:
            json.dump({"suite": suite, "model": model, "seed": seed,
                       "best_test_loss": res.best_test_loss,
                       "wall_s": time.time() - t0, "history": res.history}, fh, indent=1)
        # invalidate the stale eval row so eval_one reruns on the adopted weights
        rows = _load_rows()
        rows.pop((suite, model), None)
        with open(ROWS, "w") as fh:
            for r in rows.values():
                fh.write(json.dumps(r) + "\n")
        log(f"  adopted seed-{seed} run for {suite}/{model}")
    else:
        shutil.rmtree(cfg.ckpt_dir, ignore_errors=True)
    with open(done_marker, "w") as fh:
        json.dump({"best": res.best_test_loss, "old": old_best,
                   "adopted": res.best_test_loss < old_best}, fh)


def bench_variants_stage():
    bv_path = os.path.join(W, "logs", "bench_variants.json")
    if os.path.exists(bv_path):
        log("skip bench_variants (json exists)")
        return
    import bench_variants

    bench_variants.main()


PLAN = [
    ("bench", None, None),
    ("data", "fpe1d", None),
    ("data", "schrodinger1d", None),
    ("data", "gpe1d", None),
    ("data", "fpe2d", None),
    # headline 2-D gap + the never-run NC suite first (VERDICT r1 missing #1/#2);
    # the quick 1-D retrains interleave as budget filler — they reproduce round-1
    # numbers. fpe2d/unet (~3.5 h) is last of the 2-D queue: it is the one stage
    # that cannot fit alongside the NC suite in this round's wall clock.
    ("train", "fpe2d", "nio"),
    ("train", "fpe2d", "fno"),
    ("data", "ncfpe2d", None),
    ("train", "ncfpe2d", "nio"),
    ("train", "fpe1d", "nio"),
    ("train", "ncfpe2d", "unet"),
    ("train", "fpe1d", "fno"),
    ("train", "ncfpe2d", "fno"),
    ("train", "fpe1d", "unet"),
    ("train", "fpe2d", "unet"),
    ("train", "schrodinger1d", "nio"),
    ("train", "schrodinger1d", "fno"),
    ("train", "schrodinger1d", "unet"),
    ("train", "gpe1d", "nio"),
    ("train", "gpe1d", "fno"),
    ("train", "gpe1d", "unet"),
    ("train", "gpe1d_vgk", "nio"),
    ("retry", "schrodinger1d", "fno"),
    ("retry", "schrodinger1d", "unet"),
]


def main():
    from blindno.suites.registry import SUITES

    for kind, suite, model in PLAN:
        if stop_requested():
            log("STOP requested; exiting")
            return
        try:
            if kind == "bench":
                bench_variants_stage()
            elif kind == "data":
                kw = {"m_train": 1200} if suite == "ncfpe2d" else {}
                ensure_data(SUITES[suite], **kw)
            elif kind == "train":
                spec = SUITES[suite]
                summary = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
                train_one(spec, model)
                if os.path.exists(summary):  # only eval completed trainings
                    eval_one(suite, model)
                    compose_results()
            elif kind == "retry":
                retrain_if_better(suite, model, seed=1)
                eval_one(suite, model)
        except Exception:
            log(f"STAGE FAILED: {kind}/{suite}/{model}")
            traceback.print_exc()
    compose_results()
    log("round2 complete")


if __name__ == "__main__":
    main()
