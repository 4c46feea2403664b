"""Post-training evaluation sweep: field metrics + time-error for every trained model.

Writes runs/RESULTS.json and a RESULTS.md table comparing against the reference's
best-test-loss numbers (BASELINE.md).
"""
import json
import os
import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

W = os.environ.get("BLINDNO_WORKDIR", "/root/repo/runs")

# reference best test losses (BASELINE.md)
REFERENCE = {
    ("fpe1d", "nio"): 0.281287,
    ("fpe1d", "fno"): 0.342750,
    ("fpe1d", "unet"): 0.240148,
    ("schrodinger1d", "nio"): 0.042415,
    ("schrodinger1d", "fno"): 0.048281,
    ("schrodinger1d", "unet"): 0.038187,
    ("gpe1d", "nio"): 0.040607,
    ("gpe1d", "fno"): 0.028811,
    ("gpe1d", "unet"): 0.027363,
    ("fpe2d", "nio"): 0.115960,
    ("fpe2d", "fno"): 0.044733,
    ("fpe2d", "unet"): 0.038817,
    ("ncfpe2d", "nio"): 0.049776,
    ("ncfpe2d", "fno"): 0.067350,
    ("ncfpe2d", "unet"): 0.044678,
}


def main():
    from blindno.suites.registry import SUITES
    from blindno.eval.field_eval import evaluate_suite_model
    from blindno.eval.time_error import time_error_suite

    results = []
    ckpt_root = os.path.join(W, "ckpt")
    trained = sorted(os.listdir(ckpt_root)) if os.path.isdir(ckpt_root) else []
    for name in trained:
        if "_" not in name:
            continue
        # suite names contain underscores (gpe1d_vgk): take the LONGEST matching
        # suite prefix, not the last registration-order match
        matches = [s for s in SUITES if name.startswith(s + "_")]
        suite = max(matches, key=len) if matches else None
        model = name[len(suite) + 1:] if suite else None
        if suite is None or model not in SUITES[suite].models:
            print(f"skip unknown ckpt dir {name}")
            continue
        spec = SUITES[suite]
        entry = {"suite": suite, "model": model}
        try:
            t0 = time.time()
            rep = evaluate_suite_model(spec, model, W)
            entry.update(
                field_rel_l2=rep["mean_rel_l2_per_field"],
                rel_l2_sum=rep["mean_rel_l2_sum"],
                best_ckpt_test_loss=rep["ckpt_test_loss"],
                eval_s=round(time.time() - t0, 1),
            )
        except Exception:
            traceback.print_exc()
            entry["field_eval_error"] = True
        try:
            t0 = time.time()
            te = time_error_suite(spec, model, W, num_samples=100)
            entry.update(time_err_mean=te["mean_err_l2"], time_err_std=te["std_err_l2"],
                         time_err_s=round(time.time() - t0, 1))
        except Exception:
            traceback.print_exc()
            entry["time_error_error"] = True
        ref = REFERENCE.get((suite, model))
        if ref is not None:
            entry["reference_rel_l2"] = ref
        results.append(entry)
        print(json.dumps(entry), flush=True)

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
        te = (
            f"{e['time_err_mean']:.4f}+-{e['time_err_std']:.4f}"
            if "time_err_mean" in e
            else "-"
        )
        lines.append(
            f"| {e['suite']} | {e['model']} | "
            f"{e.get('best_ckpt_test_loss', float('nan')):.6f} | "
            f"{ref if ref is not None else '-'} | {te} |"
        )
    with open(os.path.join(W, "RESULTS.md"), "w") as fh:
        fh.write("\n".join(lines) + "\n")
    print("wrote RESULTS.json / RESULTS.md")


if __name__ == "__main__":
    main()
