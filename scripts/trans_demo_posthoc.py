"""Compose fpe2d_trans_demo_summary.json from a STOP-preempted demo run.

The round-5 queue's stage_trans_demo (scripts/round5.py) only writes its summary
when the 50-epoch run finishes; a graceful runs/STOP preemption leaves just the
JSONL curve. The demo's deliverable (VERDICT r4 weak #5 / next-step #8) is a
summary showing the registered-but-never-trained Transolver variant
(reference: 2d_FPE/NIOModules.py:85-166) trains with finite, decreasing losses —
which a partial curve already demonstrates. This composes the same summary
schema as scripts/round4._summary from the curve, CPU-only (no TPU client).

Usage: python scripts/trans_demo_posthoc.py  (no-op if the summary exists or the
curve is too short to demonstrate anything).
"""
import json
import math
import os

W = "/root/repo/runs"
CURVE = os.path.join(W, "logs", "fpe2d_trans_demo.jsonl")
OUT = os.path.join(W, "logs", "fpe2d_trans_demo_summary.json")
MIN_EPOCHS = 15


def main():
    if os.path.exists(OUT):
        print(f"summary already exists: {OUT}")
        return
    if not os.path.exists(CURVE):
        print(f"no curve at {CURVE}; demo never started")
        return
    history = []
    with open(CURVE) as fh:
        for line in fh:
            line = line.strip()
            if line:
                history.append(json.loads(line))
    if not history or history[-1]["epoch"] < MIN_EPOCHS:
        print(f"curve too short ({len(history)} records); not composing")
        return
    losses = [h["train_loss"] for h in history]
    tests = [h["test_loss"] for h in history]
    finite = all(math.isfinite(v) for v in losses + tests)
    decreasing = losses[-1] < losses[0]
    best = min(tests)
    last = history[-1]["epoch"]
    d = {
        "suite": "fpe2d",
        "model": "trans_demo",
        "best_test_loss": best,
        "wall_s": None,
        "cfg": {"epochs": 50},
        "history": history,
        "epochs_trained": last,
        "note": (
            f"STOP-preempted at epoch {last}/50 by the round-end watchdog; "
            f"losses finite={finite}, train decreasing={decreasing} "
            f"({losses[0]:.4f} -> {losses[-1]:.4f}), best test {best:.6f}. "
            "50-epoch Transolver-variant demonstration run (upgrade from "
            "parity-tested to trained); composed post-hoc from the committed "
            "JSONL curve by scripts/trans_demo_posthoc.py."
        ),
        "experiment": "50-epoch Transolver-variant demonstration run "
                      "(upgrade from parity-tested to trained)",
    }
    with open(OUT, "w") as fh:
        json.dump(d, fh, indent=1)
    print(f"wrote {OUT}: epochs {last}, finite={finite}, "
          f"decreasing={decreasing}, best test {best:.6f}")


if __name__ == "__main__":
    main()
