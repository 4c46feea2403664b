"""Regenerate the Results section of README.md from runs/ summaries + RESULTS.json."""
import json
import glob
import os
import sys

sys.path.insert(0, "/root/repo")

REF = {
    ("fpe1d", "nio"): 0.281287, ("fpe1d", "fno"): 0.342750, ("fpe1d", "unet"): 0.240148,
    ("schrodinger1d", "nio"): 0.042415, ("schrodinger1d", "fno"): 0.048281,
    ("schrodinger1d", "unet"): 0.038187,
    ("gpe1d", "nio"): 0.040607, ("gpe1d", "fno"): 0.028811, ("gpe1d", "unet"): 0.027363,
    ("fpe2d", "nio"): 0.115960, ("fpe2d", "fno"): 0.044733, ("fpe2d", "unet"): 0.038817,
    ("ncfpe2d", "nio"): 0.049776, ("ncfpe2d", "fno"): 0.067350, ("ncfpe2d", "unet"): 0.044678,
}
NAMES = {"nio": "NIO", "fno": "FNO-NIO", "unet": "BlinDNO"}


def main():
    rows = []
    results = {}
    rj = "/root/repo/runs/RESULTS.json"
    if os.path.exists(rj):
        for e in json.load(open(rj)):
            results[(e["suite"], e["model"])] = e
    for f in sorted(glob.glob("/root/repo/runs/logs/*_summary.json")):
        d = json.load(open(f))
        key = (d["suite"], d["model"])
        ref = REF.get(key)
        te = results.get(key, {})
        te_s = (f"{te['time_err_mean']:.4f}" if "time_err_mean" in te else "-")
        status = ""
        if ref:
            status = "**beats ref**" if d["best_test_loss"] < ref else "close" if d["best_test_loss"] < 1.15 * ref else "behind (see notes)"
        rows.append(
            f"| {d['suite']} | {NAMES.get(d['model'], d['model'])} | "
            f"{d['best_test_loss']:.4f} | {ref if ref else '-'} | {te_s} | {status} |"
        )
    # include preempted/partial models present in RESULTS.json but without summaries
    for (suite, model), e in sorted(results.items()):
        if any(f"| {suite} | {NAMES.get(model, model)} |" in r for r in rows):
            continue
        ref = REF.get((suite, model))
        te_s = (f"{e['time_err_mean']:.4f}" if "time_err_mean" in e else "-")
        rows.append(
            f"| {suite} | {NAMES.get(model, model)} | "
            f"{e.get('best_ckpt_test_loss', float('nan')):.4f}* | {ref if ref else '-'} | {te_s} | partial (resumable) |"
        )

    section = "\n".join([
        "## Results (round 1)",
        "",
        "Best test rel-L2 (sum over output fields, reference metric incl. its",
        "full-target-denominator quirk); time-err = solution-space time-averaged",
        "density rollout error (the reference never recorded its own values).",
        "`*` = training preempted mid-run (resumable).",
        "",
        "| Suite | Model | ours | reference | time-err | |",
        "|---|---|---|---|---|---|",
        *rows,
        "",
        "Throughput: `bench.py` measures the full 2D FPE NIO train step on one TPU",
        "v5e chip (~65 steps/s vs ~12/s A100 PyTorch estimate).",
        "",
    ])
    readme = open("/root/repo/README.md").read()
    marker = "## Results (round 1)"
    if marker in readme:
        head = readme.split(marker)[0]
        tail_idx = readme.find("## Usage")
        tail = readme[tail_idx:] if tail_idx > readme.find(marker) else ""
        readme = head + section + tail
    else:
        readme = readme.replace("## Usage", section + "## Usage")
    open("/root/repo/README.md", "w").write(readme)
    print("\n".join(rows))


if __name__ == "__main__":
    main()
