"""Regenerate the Results section of README.md from runs/ summaries + RESULTS.json.

Round-aware: current-round summaries live in runs/logs/*_summary.json; earlier
rounds' archived summaries (runs/logs/r1/ etc.) fill rows not retrained this round,
marked with their round tag.
"""
import glob
import json
import os
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_all import W  # noqa: E402  (shared workdir, env-overridable)

REF = {
    ("fpe1d", "nio"): 0.281287, ("fpe1d", "fno"): 0.342750, ("fpe1d", "unet"): 0.240148,
    ("schrodinger1d", "nio"): 0.042415, ("schrodinger1d", "fno"): 0.048281,
    ("schrodinger1d", "unet"): 0.038187,
    ("gpe1d", "nio"): 0.040607, ("gpe1d", "fno"): 0.028811, ("gpe1d", "unet"): 0.027363,
    ("fpe2d", "nio"): 0.115960, ("fpe2d", "fno"): 0.044733, ("fpe2d", "unet"): 0.038817,
    ("ncfpe2d", "nio"): 0.049776, ("ncfpe2d", "fno"): 0.067350, ("ncfpe2d", "unet"): 0.044678,
}
NAMES = {"nio": "NIO", "fno": "FNO-NIO", "unet": "BlinDNO"}
ORDER = list(REF) + [("gpe1d_vgk", "nio")]

# Row-specific evidence context the generic labels can't carry (round-4 advisor:
# a bare "close" hid that the currently reproducible run sits behind a lost one).
EXTRA_NOTES = {
    ("schrodinger1d", "unet"):
        "pre-wipe seed-1 run matched ref at 0.0384 (summary kept as "
        "schrodinger1d_unet_summary_prewipe.json); identical-config rerun landed here",
}


def _bf16_lines():
    """Throughput-paragraph lines describing the bf16 headline gate's state
    (bench.py flips its headline on the same summary; keep the README in sync)."""
    import bench

    val = bench.bf16_validation()
    if val is None:
        return ["The accuracy-validated bf16 training mode is pending its validation",
                "row (`TrainConfig.compute_dtype`); until then the headline is f32."]
    policy = val.get("amp_policy", "all")
    if val["passed"]:
        return [f"The bf16 mixed-precision mode (amp_policy='{policy}') is "
                f"accuracy-validated (fpe1d/nio: {val['bf16_best_test_rel_l2']:.4f} "
                f"bf16 vs {val['f32_best_test_rel_l2']:.4f} f32), so the benchmark",
                "headline uses it, with the f32 figure reported alongside (bench.py",
                "docstring records the gate and the comparison rationale)."]
    return [f"The bf16 mixed-precision mode (amp_policy='{policy}') FAILED its "
            f"accuracy gate (fpe1d/nio: {val['bf16_best_test_rel_l2']:.4f} bf16 vs "
            f"{val['f32_best_test_rel_l2']:.4f} f32); the headline stays f32."]


def _collect():
    """(suite, model) -> (best_test_loss, round_tag), current round preferred."""
    out = {}
    for tag, pattern in (("r1", "/root/repo/runs/logs/r1/*_summary.json"),
                         ("", "/root/repo/runs/logs/*_summary.json")):
        for f in sorted(glob.glob(pattern)):
            d = json.load(open(f))
            # experiment summaries (leakage falsification, bf16 accuracy gates,
            # m-scaling datapoints, short demo runs) are evidence artifacts, not
            # results rows — their context lives in docs/ and the throughput text
            if any(t in d["model"] for t in ("leakdemo", "bf16val", "_m12k", "_demo")):
                continue
            out[(d["suite"], d["model"])] = (d["best_test_loss"], tag)
    return out


def main():
    results = {}
    rj = "/root/repo/runs/RESULTS.json"
    if os.path.exists(rj):
        for e in json.load(open(rj)):
            results[(e["suite"], e["model"])] = e
    summaries = _collect()
    keys = ORDER + sorted(k for k in set(summaries) | set(results) if k not in ORDER)

    rows = []
    for key in keys:
        if key not in summaries and key not in results:
            continue
        suite, model = key
        ref = REF.get(key)
        e = results.get(key, {})
        te_s = f"{e['time_err_mean']:.4f}" if "time_err_mean" in e else "-"
        tta_s = f"{e['rel_l2_sum_tta']:.4f}" if "rel_l2_sum_tta" in e else "-"
        if key in summaries:
            loss, tag = summaries[key]
        else:
            loss, tag = e.get("best_ckpt_test_loss", float("nan")), "partial"
        status = ""
        if ref:
            margin = 100.0 * (loss / ref - 1.0)
            status = ("**beats ref**" if loss < ref
                      else f"close (ref {margin:+.0f}%)" if loss < 1.15 * ref
                      else "behind (see notes)")
        note = EXTRA_NOTES.get(key)
        if note:
            status = ", ".join(s for s in (status, note) if s)
        if tag == "r1":
            status = ", ".join(s for s in (status, "round-1 run (not re-evaluated this round)") if s)
        elif tag == "partial":
            status = ", ".join(s for s in (status, "preempted (resumable)") if s)
        # evidence-basis honesty, independent of the round/partial tag (a round-1 or
        # preempted row can ALSO have lost its checkpoint): rows whose checkpoint no
        # longer exists rest on committed logs/RESULTS rows only (mid-round-3 wipe)
        if not os.path.isdir(os.path.join(W, "ckpt", f"{suite}_{model}")):
            status = ", ".join(s for s in (status, "ckpt lost in host wipe (row from committed logs)") if s)
        rows.append(f"| {suite} | {NAMES.get(model, model)} | {loss:.4f} | {tta_s} | "
                    f"{ref if ref else '-'} | {te_s} | {status} |")

    section = "\n".join([
        "## Results",
        "",
        "Best test rel-L2 (sum over output fields, reference metric incl. its",
        "full-target-denominator quirk); TTA = symmetry test-time ensembling on the",
        "augmentation-trained 2-D suites (extra evidence column, not the headline);",
        "time-err = solution-space time-averaged density rollout error (the",
        "reference never recorded its own values).",
        "",
        "On the remaining 2-D gaps: `docs/fpe2d_gap_analysis.md` documents the",
        "parity-verification record and the quantitative evidence that the",
        "reference's 2-D headline numbers reflect train/test contamination in its",
        "uncommitted 2-D archives (our unaugmented train-fit error equals its",
        "published test error model-by-model; the suites with committed train",
        "datagens are exactly the ones we beat). The round-4 duplicate-and-split",
        "falsification run reproduces the published number from contamination",
        "alone: tiling 2000 unique samples x4 and random-splitting yields",
        "split-test 0.0305 < the published 0.038817, vs 0.2057 honest",
        "(`runs/logs/fpe2d_unet_leakdemo_summary.json`).",
        "",
        "| Suite | Model | ours | ours (TTA) | reference | time-err | |",
        "|---|---|---|---|---|---|---|",
        *rows,
        "",
        "Throughput: `bench.py` measures the full 2D FPE NIO train step on one TPU",
        "v5e chip against an A100 baseline derived from counted torch FLOPs",
        "(`runs/logs/torch_baseline.json`) times a cited sustained-throughput band,",
        "reported as a mid value plus a conservative range, with achieved TFLOP/s and",
        "MFU (see BENCH_r*.json).",
        *_bf16_lines(),
        "The driver's >=5x north-star is NOT met on this honest anchor (f32 1.9x",
        "mid-band; bf16 measured 2.65x in round 4); the step runs at the",
        "HBM-bandwidth roof (profile_r04_analysis.md), putting >=5x out of reach on",
        "one chip — see BASELINE.md's roofline reconciliation.",
        "`runs/logs/bench_variants.json` records the jnp-vs-Pallas kernel comparison",
        "behind the default spectral impl.",
        "",
        "",
    ])
    readme = open("/root/repo/README.md").read()
    for marker in ("## Results (round 1)", "## Results"):
        if marker in readme:
            head = readme.split(marker)[0]
            tail_idx = readme.find("## Usage")
            tail = readme[tail_idx:] if tail_idx > readme.find(marker) else ""
            readme = head + section + tail
            break
    else:
        readme = readme.replace("## Usage", section + "## Usage")
    open("/root/repo/README.md", "w").write(readme)
    print("\n".join(rows))


if __name__ == "__main__":
    main()
