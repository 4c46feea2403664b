"""Add symmetry-TTA columns to existing RESULTS rows (post-hoc).

The round-3 queue process imported blindno.eval.field_eval before TTA landed, so its
rows lack the rel_l2_sum_tta column. This script re-runs field eval for every row
whose suite trains with augmentation (TrainConfig.augment) and whose checkpoint is on
disk, adds the TTA columns, and recomposes RESULTS.{json,md}.

TPU discipline: run ONLY when the queue has exited (single-client tunnel).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_all import W, log  # noqa: E402
from round2 import ROWS, _load_rows, compose_results  # noqa: E402


def main():
    from blindno.suites.registry import SUITES
    from blindno.eval.field_eval import evaluate_suite_model

    rows = _load_rows()
    changed = False
    for (suite, model), row in rows.items():
        spec = SUITES.get(suite)
        if spec is None or not getattr(spec.train_cfg, "augment", None):
            continue
        if "rel_l2_sum_tta" in row:
            continue
        ckpt_dir = os.path.join(W, "ckpt", f"{suite}_{model}")
        if not os.path.isdir(ckpt_dir):
            log(f"skip {suite}/{model}: no checkpoint on disk")
            continue
        log(f"TTA eval {suite}/{model}")
        t0 = time.time()
        try:
            rep = evaluate_suite_model(spec, model, W, save_predictions=False,
                                       make_figures=False)
        except Exception as e:
            log(f"  failed: {e}")
            continue
        row["field_rel_l2_tta"] = rep["mean_rel_l2_per_field_tta"]
        row["rel_l2_sum_tta"] = rep["mean_rel_l2_sum_tta"]
        changed = True
        log(f"  plain {rep['mean_rel_l2_sum']:.6f} -> tta {rep['mean_rel_l2_sum_tta']:.6f}"
            f" ({time.time() - t0:.0f}s)")
    if changed:
        with open(ROWS, "w") as fh:
            for r in rows.values():
                fh.write(json.dumps(r) + "\n")
        compose_results()
    log("patch_tta_rows done")


if __name__ == "__main__":
    main()
