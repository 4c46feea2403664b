"""CLI entry point: dataset generation, training, and evaluation for every suite.

Usage:
    python -m blindno.suites.run --suite fpe1d --stage datagen
    python -m blindno.suites.run --suite fpe1d --model nio --stage train
    python -m blindno.suites.run --suite fpe1d --model nio --stage eval

Artifacts land under --workdir: datasets as npz (reference-compatible keys),
checkpoints under ckpt/{suite}_{model}/, metrics JSONL under logs/.
"""
from __future__ import annotations

import argparse
import dataclasses
import json
import os

import numpy as np

from blindno.suites.registry import SUITES


def _data_path(workdir, name):
    return os.path.join(workdir, "data", name)


def stage_datagen(spec, args):
    os.makedirs(os.path.join(args.workdir, "data"), exist_ok=True)
    m_train = args.m or spec.m_train
    m_test = args.m_test or spec.m_test
    train_path = _data_path(args.workdir, spec.train_file)
    test_path = _data_path(args.workdir, spec.test_file)
    if not os.path.exists(train_path) or args.force:
        print(f"[{spec.name}] generating train set (m={m_train})...")
        d = spec.datagen_train(args.seed, m_train)
        np.savez(train_path, **d)
        print(f"  -> {train_path}")
    else:
        print(f"[{spec.name}] train set exists: {train_path}")
    if not os.path.exists(test_path) or args.force:
        print(f"[{spec.name}] generating test set (m={m_test})...")
        d = spec.datagen_test(args.seed + 1000, m_test)
        np.savez(test_path, **d)
        print(f"  -> {test_path}")
    else:
        print(f"[{spec.name}] test set exists: {test_path}")


def _load_npz(path):
    with np.load(path, allow_pickle=True) as z:
        return {k: z[k] for k in z.files}


def stage_train(spec, args):
    from blindno.train.loop import train_model

    data = spec.loader(_load_npz(_data_path(args.workdir, spec.train_file)))
    cfg = dataclasses.replace(
        spec.train_cfg,
        epochs=args.epochs or spec.train_cfg.epochs,
        ckpt_dir=os.path.join(args.workdir, "ckpt", f"{spec.name}_{args.model}"),
        log_path=os.path.join(args.workdir, "logs", f"{spec.name}_{args.model}.jsonl"),
        seed=args.seed,
        **({"tp": args.tp} if args.tp else {}),
    )
    model = spec.models[args.model]()
    print(f"[{spec.name}/{args.model}] training {cfg.epochs} epochs...")
    res = train_model(model, data, spec.grid, cfg)
    print(f"[{spec.name}/{args.model}] best test rel-L2 (sum over fields): {res.best_test_loss:.6f}")
    summary_path = os.path.join(args.workdir, "logs", f"{spec.name}_{args.model}_summary.json")
    with open(summary_path, "w") as fh:
        json.dump({"suite": spec.name, "model": args.model,
                   "best_test_loss": res.best_test_loss, "history": res.history}, fh, indent=1)
    return res


def stage_eval(spec, args):
    from blindno.eval.field_eval import evaluate_suite_model

    report = evaluate_suite_model(spec, args.model, args.workdir)
    print(json.dumps(report, indent=1))


def stage_time_error(spec, args):
    from blindno.eval.time_error import time_error_suite

    report = time_error_suite(spec, args.model, args.workdir, num_samples=args.m or 100)
    print(json.dumps(report, indent=1))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--suite", required=True, choices=sorted(SUITES))
    p.add_argument("--model", default="nio")
    p.add_argument("--stage", required=True,
                   choices=["datagen", "train", "eval", "time-error"])
    p.add_argument("--workdir", default="runs")
    p.add_argument("--epochs", type=int, default=None)
    p.add_argument("--m", type=int, default=None)
    p.add_argument("--m-test", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--tp", type=int, default=None,
                   help="tensor-parallel factor: shard FNO channel dims over a "
                        "'model' mesh axis; the batch shards over the remaining "
                        "devices (data axis). Default: registry config (1).")
    p.add_argument("--force", action="store_true")
    args = p.parse_args()
    spec = SUITES[args.suite]
    if args.stage != "datagen" and args.model not in spec.models:
        p.error(
            f"unknown model {args.model!r} for suite {args.suite!r}; "
            f"choose from: {', '.join(sorted(spec.models))}"
        )
    os.makedirs(os.path.join(args.workdir, "logs"), exist_ok=True)
    {"datagen": stage_datagen, "train": stage_train,
     "eval": stage_eval, "time-error": stage_time_error}[args.stage](spec, args)


if __name__ == "__main__":
    main()
