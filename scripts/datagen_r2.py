"""Round-2 dataset generation: every suite's train/test npz, one TPU process.

Run FIRST in round 2 (datasets were not carried over; fpe2d is upsized to m=8000 per
round-1 finding that m=2000 plateaus far above the reference accuracy). All stages are
resumable: existing npz files are skipped. Touch runs/STOP to halt between stages.
"""
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from run_all import ensure_data, log, stop_requested  # noqa: E402


def main():
    from blindno.suites.registry import SUITES

    stages = [
        ("fpe1d", {}),
        ("schrodinger1d", {}),
        ("gpe1d", {}),
        ("fpe2d", {}),               # m_train=8000 from the registry
        ("ncfpe2d", {"m_train": 1600}),
    ]
    for suite, kw in stages:
        if stop_requested():
            log("STOP requested; exiting")
            return
        t0 = time.time()
        ensure_data(SUITES[suite], **kw)
        log(f"stage {suite} data done ({time.time() - t0:.0f}s)")
    log("datagen_r2 complete")


if __name__ == "__main__":
    main()
