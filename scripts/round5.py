"""Round-5 TPU queue: evidence + the 2-D gap (VERDICT r4 "Next round: do this").

Priorities, in value-per-TPU-hour order (single TPU client, rolling runs/DEADLINE,
graceful runs/STOP preemption, per-stage evidence commits — all via round4's
helpers):

 1. fpe1d/nio bf16 validation with the profile-guided amp_policy='encoder'
    (VERDICT #2/#5): the round-4 full-bf16 gate FAILED accuracy by 30%; the r4
    profile pins >=95% of step time in the CNN encoder, so casting only it should
    keep the bandwidth win while the sensitive DeepONet/FNO tail stays f32. If the
    gate passes, bench.py's headline flips to bf16 automatically (the summary's
    amp_policy field rides along).
 2. fpe2d dataset regen (seed 0; wiped) + the two deadline-skipped fpe2d augmented
    retrains — nio, fno (VERDICT #1). These rows are the worst on the board and
    have no durable checkpoints.
 3. ncfpe2d dataset regen + ncfpe2d/nio augmented retrain (VERDICT #1).
 4. schrodinger1d/unet fresh-seed retries (VERDICT #4: 0.0431 vs ref 0.0382).
 5. fpe2d/trans short demonstration run (VERDICT weak #5: parity-tested, never
    trained).
 6. (stretch) fpe2d m-scaling datapoint for the contamination thesis (VERDICT #3).

Epoch capping: round-4's est-skip left 3.5h-class stages entirely unrun when the
window was slightly short. Here the long variants are epoch-capped to the remaining
window instead (min 150 epochs, snapped to save_interval), so tail hours become a
finished partial run with a summary + durable best checkpoint — the same contract
as the adopted fpe2d/fno e301 row ("wall-clock budget" note in its summary).
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import round4 as r4  # noqa: E402  (shared queue infrastructure)
from round4 import W, log, stop_requested  # noqa: E402
from run_all import ensure_data  # noqa: E402

BF16_ACCURACY_TOL = 1.05  # bench.py's gate


def stage_bf16val_enc(policy="encoder", tag="bf16val_enc"):
    """Accuracy validation for compute_dtype=bfloat16 + the given amp_policy.

    Writes fpe1d_nio_{tag}_summary.json always; on a PASS it also becomes
    the bench gate file fpe1d_nio_bf16val_summary.json (the failed round-4
    all-leaves run is archived as ..._allbf16_summary.json, the name
    blindno/train/loop.py's amp_policy docstring cites). Attempt history:
    'all' FAILED r4 (0.2359), 'encoder' FAILED r5 (0.2042, need <=0.1896);
    'encoder_bn32' (torch-autocast-faithful: BN leaves stay f32) is attempt 3."""
    from blindno.suites.registry import SUITES

    suite, model = "fpe1d", "nio"
    spec = SUITES[suite]
    enc_path = os.path.join(W, "logs", f"{suite}_{model}_{tag}_summary.json")
    if os.path.exists(enc_path):
        log(f"skip {tag} (summary exists)")
        return
    ensure_data(spec)
    res, cfg, wall = r4._train(
        spec, model, f"{suite}_{model}_{tag}",
        {"compute_dtype": "bfloat16", "amp_policy": policy})
    if not res.finished:
        return
    f32_best = None
    f32_summary = os.path.join(W, "logs", f"{suite}_{model}_summary.json")
    if os.path.exists(f32_summary):
        with open(f32_summary) as fh:
            f32_best = json.load(fh)["best_test_loss"]
    d = r4._summary(
        res, cfg, suite, f"{model}_{tag}", wall,
        {"experiment": f"compute_dtype=bfloat16 amp_policy={policy} accuracy validation",
         "compute_dtype": "bfloat16", "amp_policy": policy,
         "f32_row_best": f32_best})
    with open(enc_path, "w") as fh:
        json.dump(d, fh, indent=1)
    passed = f32_best is not None and res.best_test_loss <= BF16_ACCURACY_TOL * f32_best
    gate = os.path.join(W, "logs", f"{suite}_{model}_bf16val_summary.json")
    if passed:
        if os.path.exists(gate):
            with open(gate) as fh:
                old = json.load(fh)
            if "amp_policy" not in old:  # the round-4 all-leaves FAILED run
                os.replace(gate, os.path.join(
                    W, "logs", f"{suite}_{model}_bf16val_allbf16_summary.json"))
        with open(gate, "w") as fh:
            json.dump(d, fh, indent=1)
        log(f"  {tag} GATE PASSED: {res.best_test_loss:.6f} <= "
            f"{BF16_ACCURACY_TOL:.2f} x {f32_best:.6f} — bench headline flips to "
            f"bfloat16/{policy}")
    else:
        log(f"  {tag} gate failed: {res.best_test_loss:.6f} vs f32 {f32_best} "
            f"(tol {BF16_ACCURACY_TOL:.2f}x) — headline stays float32")


def stage_variant_fit(suite, model, tag, sec_per_epoch, min_epochs=150, reserve=0):
    """stage_variant, but epoch-capped to the remaining deadline window.

    sec_per_epoch: measured whole-stage seconds per epoch (train + amortized
    load/eval/commit overhead). reserve: seconds to leave for later cheap stages.
    A window below min_epochs' worth skips (a <150-epoch 2-D run never improves
    on the incumbent rows).

    Resume-aware: a best_* checkpoint surviving in the run's ckpt dir (host-wipe
    leftover) means the train loop's warm-restart path skips its epochs, so they
    are counted into the cap and the min-window bar drops to 100 incremental
    epochs (the lost run already paid the from-scratch phase)."""
    import glob
    import re

    from blindno.suites.registry import SUITES

    full = SUITES[suite].train_cfg.epochs
    save = SUITES[suite].train_cfg.save_interval
    done = 0
    for p in glob.glob(os.path.join(W, "ckpt", f"{suite}_{model}_{tag}", "best_*")):
        m = re.search(r"_e(\d+)", os.path.basename(p))
        if m:
            done = max(done, int(m.group(1)))
    window = int((r4.remaining() - reserve) / sec_per_epoch // save * save)
    fit = done + window
    if fit >= full:
        overrides = None
    elif window >= (100 if done else min_epochs):
        overrides = {"epochs": fit}
        log(f"variant {suite}/{model}:{tag} epoch-capped to {fit}/{full} "
            f"(warm-restart from e{done}, remaining window {r4.remaining():.0f}s, "
            f"reserve {reserve}s)")
    else:
        log(f"skip variant {suite}/{model}:{tag}: window fits only {window} epochs "
            f"past e{done} < min {100 if done else min_epochs}")
        return
    r4.stage_variant(suite, model, tag, overrides)


def stage_fpe2d_scale():
    """VERDICT #3 (stretch): one larger-m datapoint for the contamination scaling
    law (docs/fpe2d_gap_analysis.md §2: rel-L2 ~ m^-0.48 over m=2k/8k; the thesis
    needs a point above 8k to confirm or break the exponent).

    Builds an m=12000 train set by extending the seed-0 m=8000 archive with a
    seed-1 m=4000 generation (fpe2d_train_ext4k.npz — disjoint parameter draws;
    m=12000 keeps the device-resident bf16 input tensor ~9 GB, safely under the
    16 GB v5e HBM, where m=16000 would risk OOM). Trains fpe2d/unet at the
    registry config (D4 aug), epoch-capped. Summary-only, NOT a RESULTS row (the
    row protocol is m=8000): fpe2d_unet_m12k_summary.json. Law prediction:
    0.1398 * (12/8)^-0.48 = 0.115; materially below breaks the thesis."""
    import dataclasses

    import numpy as np

    from blindno.suites.registry import SUITES

    summary_path = os.path.join(W, "logs", "fpe2d_unet_m12k_summary.json")
    if os.path.exists(summary_path):
        log("skip fpe2d m12k scale (summary exists)")
        return
    spec = SUITES["fpe2d"]
    ensure_data(spec)
    ext = os.path.join(W, "data", "fpe2d_train_ext4k.npz")
    if not os.path.exists(ext):
        from blindno.data import generate as G

        log("datagen fpe2d ext m=4000 (seed 1)")
        d = G.generate_fpe2d(seed=1, m=4000)
        tmp = ext + ".tmp.npz"
        np.savez(tmp, **d)
        os.replace(tmp, ext)
    key = "fpe2d_m12k"
    if key not in r4._DATA:
        t0 = time.time()
        src = os.path.join(W, "data", spec.train_file)
        with np.load(src, allow_pickle=True) as z:
            raw = {k: z[k] for k in z.files}
        with np.load(ext, allow_pickle=True) as z:
            raw = {k: np.concatenate([raw[k], z[k]], axis=0) for k in raw}
        r4._DATA[key] = spec.loader(raw)
        del raw
        log(f"built m=12000 archive in {time.time() - t0:.0f}s")
    from blindno.train.loop import train_model

    full = spec.train_cfg.epochs
    # ~27 s/epoch at 600 steps/epoch (unet m=8k measured 18.2 s/epoch at 400)
    fit = int((r4.remaining() - 600) / 27.0 // 5 * 5)
    if fit < 150:
        log(f"skip fpe2d m12k scale: window fits only {fit} epochs")
        return
    cfg = dataclasses.replace(
        spec.train_cfg,
        epochs=min(fit, full),
        ckpt_dir=os.path.join(W, "ckpt", "fpe2d_unet_m12k"),
        log_path=os.path.join(W, "logs", "fpe2d_unet_m12k.jsonl"),
        stop_file=os.path.join(W, "STOP"),
        early_stop_patience=130,
    )
    model = spec.models["unet"]()
    log(f"train fpe2d_unet_m12k for {cfg.epochs}/{full} epochs (scaling-law point)")
    t0 = time.time()
    res = train_model(model, r4._DATA[key], spec.grid, cfg)
    wall = time.time() - t0
    if not res.finished:
        return
    d = r4._summary(res, cfg, "fpe2d", "unet_m12k", wall,
                    {"experiment": "m-scaling datapoint (contamination-thesis test)",
                     "m_train": 12000,
                     "law_prediction_m12k": 0.115,
                     "honest_m8k_row": 0.139771})
    with open(summary_path, "w") as fh:
        json.dump(d, fh, indent=1)
    log(f"  m12k best split-test {res.best_test_loss:.6f} "
        f"(law predicts ~0.115; m8k row 0.1398)")


def stage_trans_demo():
    """Short demonstration run of the registered-but-never-trained Transolver
    variant (VERDICT weak #5): 50 epochs of fpe2d/trans at the registry config.
    NOT a RESULTS row — the reference never trains it either; the deliverable is
    a summary with finite, decreasing losses (fpe2d_trans_demo_summary.json)."""
    summary_path = os.path.join(W, "logs", "fpe2d_trans_demo_summary.json")
    if os.path.exists(summary_path):
        log("skip trans demo (summary exists)")
        return
    from blindno.suites.registry import SUITES

    spec = SUITES["fpe2d"]
    ensure_data(spec)
    res, cfg, wall = r4._train(spec, "trans", "fpe2d_trans_demo", {"epochs": 50})
    if not res.finished:
        return
    d = r4._summary(res, cfg, "fpe2d", "trans_demo", wall,
                    {"experiment": "50-epoch Transolver-variant demonstration run "
                                   "(upgrade from parity-tested to trained)"})
    with open(summary_path, "w") as fh:
        json.dump(d, fh, indent=1)
    log(f"  trans demo best {res.best_test_loss:.6f} (train curve in "
        f"runs/logs/fpe2d_trans_demo.jsonl)")


# (fn, args, est_cost_s, name) — round4.run_pass contract. Ests include datagen/
# load where the stage pays it; the *_fit stages self-cap instead of est-skipping,
# so their est is the minimum worth starting (min_epochs' worth).
PLAN = [
    # Session-3 reorder (post fourth host wipe, 22:46): the wipe killed the queue
    # mid fpe2d/nio-aug (e115 best_* survived via wipe insurance; runs/data and
    # resume.msgpack did not). Completed stages self-skip via their summaries.
    # Order: the cheap bench-headline gate retry first (torch-autocast-faithful
    # BN-f32 policy — attempts: 'all' FAILED r4 0.2359, 'encoder' FAILED r5
    # 0.2042, need <=0.1896), then the fpe2d regen + the top VERDICT item resumed
    # from e115 via the train loop's new best_* warm-restart path. The bn32
    # string args are (policy, tag), NOT (suite, model) — no fpe1d_nio
    # eval/compose is triggered because run_pass gates that on
    # logs/{args0}_{args1}_summary.json, which never exists.
    (stage_bf16val_enc, ("encoder_bn32", "bf16val_bn32"), 2000,
     "fpe1d/nio bf16val encoder_bn32-policy"),
    (r4.stage_data, ("fpe2d",), 3100, "fpe2d data"),
    # measured 15.1 steps/s x 500 steps/epoch => 33 s/epoch + eval overhead;
    # reserve 900s for the post-stage eval_one + compose + commit
    (stage_variant_fit, ("fpe2d", "nio", "aug", 34.0, 150, 900), 4200, "fpe2d/nio aug"),
    # seed-1 replay of the lost pre-wipe 0.038363 row (incumbent seed-0 row is
    # 0.043068; datasets regenerate bit-identically so seed 1 re-reaches ~0.0384)
    (r4.stage_variant, ("schrodinger1d", "unet", "s1b", {"seed": 1}), 2100,
     "schrodinger1d/unet seed-1 replay"),
    (stage_variant_fit, ("fpe2d", "fno", "aug", 32.0, 150, 2400), 5800, "fpe2d/fno aug"),
    (stage_trans_demo, (), 2200, "fpe2d/trans 50-epoch demo"),
    (r4.stage_data, ("ncfpe2d",), 2400, "ncfpe2d data"),
    (stage_variant_fit, ("ncfpe2d", "nio", "aug", 19.0), 3800, "ncfpe2d/nio aug"),
    (r4.stage_retry, ("schrodinger1d", "unet", 3), 1700, "schrodinger1d/unet s3"),
    (stage_fpe2d_scale, (), 5800, "fpe2d m12k scaling-law point"),
    (r4.stage_retry, ("schrodinger1d", "unet", 4), 1700, "schrodinger1d/unet s4"),
]


def run_pass():
    """round4.run_pass with round5's PLAN and commit tag."""
    r4.PLAN = PLAN
    t = time.time()
    # reuse round4's loop verbatim (idempotent stages, est-skip, per-stage
    # eval_one/compose/commit); only the commit message prefix differs
    orig = r4.commit_evidence

    def tagged(msg, ckpt_dirs=()):
        orig(msg.replace("round4:", "round5:"), ckpt_dirs)

    r4.commit_evidence = tagged
    try:
        return r4.run_pass()
    finally:
        r4.commit_evidence = orig
        _ = time.time() - t


def main():
    log(f"round5 queue start; deadline in {r4.remaining()/3600:.2f}h")
    while not stop_requested():
        spent = run_pass()
        if spent < 120:
            break
    r4.compose_results()
    r4.commit_evidence("round5: queue final compose")
    log("round5 queue complete")


if __name__ == "__main__":
    main()
