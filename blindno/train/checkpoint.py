"""Checkpointing: best-by-metric retention plus full resume state.

Strict superset of the reference's ``torch.save(state_dict)`` best-only scheme with the
loss embedded in the filename and old-best deletion (``1d_FPE/train_nio.py:159-165``):
we keep the metric-stamped best directory AND (optionally) optimizer state + step for
resume, which the reference lacks entirely (SURVEY.md §5.4). Orbax handles sharded
arrays transparently under a mesh.
"""
from __future__ import annotations

import glob
import os
import shutil

import jax
import orbax.checkpoint as ocp


def _checkpointer():
    return ocp.StandardCheckpointer()


def _best_loss_of(path: str) -> float:
    """Parse the loss out of a ``best_{loss:.6f}[_e{epoch}]`` directory name
    (both the current epoch-stamped and the pre-round-3 loss-only formats)."""
    try:
        return float(os.path.basename(path).split("_")[1])
    except (IndexError, ValueError):
        return float("inf")


def save_best(ckpt_dir: str, params, batch_stats, epoch: int, test_loss: float):
    """Save best params/batch_stats to ``{dir}/best_{loss:.6f}_e{epoch}``.

    The epoch suffix keeps names unique when two improvements round to the same
    6-decimal loss (orbax refuses to overwrite an existing destination — observed
    mid-round-3 on gpe1d_vgk at epochs 400/410, both ``best_0.005315``). The new
    checkpoint is written BEFORE older ``best_*`` dirs are deleted, so a crash
    mid-save never leaves the directory empty (and ``load_best`` picks the numerically
    best if more than one survives)."""
    os.makedirs(ckpt_dir, exist_ok=True)
    olds = glob.glob(os.path.join(ckpt_dir, "best_*"))
    path = os.path.abspath(os.path.join(ckpt_dir, f"best_{test_loss:.6f}_e{epoch}"))
    if os.path.exists(path):
        # same loss AND epoch: a resume replay. Move the old dir ASIDE (it still
        # parses as a valid fallback for load_best) and delete it only after the
        # new save lands — rmtree-before-save would leave the dir best-less if the
        # process died mid-save (round-3 advisor finding).
        aside = path + ".old"
        shutil.rmtree(aside, ignore_errors=True)
        os.replace(path, aside)
        olds = [aside if os.path.abspath(o) == path else o for o in olds]
    ckptr = _checkpointer()
    state = {
        "params": jax.tree.map(lambda a: a, params),
        "batch_stats": jax.tree.map(lambda a: a, batch_stats),
        "epoch": epoch,
        "test_loss": test_loss,
    }
    ckptr.save(path, state)
    ckptr.wait_until_finished()
    for old in olds:
        if os.path.abspath(old) != path:
            shutil.rmtree(old, ignore_errors=True)
    return path


def load_best(ckpt_dir: str):
    """Load the numerically-best checkpoint in ``ckpt_dir`` (smallest parsed loss —
    lexicographic order would pick the WORST if multiple ``best_*`` dirs survive a
    crash; the reference's eval scripts similarly glob metric-stamped filenames)."""
    matches = glob.glob(os.path.join(os.path.abspath(ckpt_dir), "best_*"))
    if not matches:
        raise FileNotFoundError(f"no best_* checkpoint under {ckpt_dir}")
    ckptr = _checkpointer()
    return ckptr.restore(min(matches, key=_best_loss_of))


def load_best_as_warm_restart(ckpt_dir: str, params_target, batch_stats_target):
    """Best-checkpoint fallback for when ``resume.msgpack`` is gone (host wipe:
    the wipe-insurance snapshots commit only the small orbax ``best_*`` dirs —
    resume files carry optimizer state and are too large to commit every 20 min).

    Returns ``{"params", "batch_stats", "epoch", "test_loss"}`` with the arrays
    restructured onto the given target trees, or ``None`` when no ``best_*``
    exists, the structures mismatch (a different model), or the params are
    non-finite. Optimizer state is NOT recoverable from a best checkpoint — the
    caller performs a warm restart (fresh moments, advanced step count)."""
    import flax.serialization as fser
    import numpy as np

    try:
        raw = load_best(ckpt_dir)
    except FileNotFoundError:
        return None
    try:
        params = fser.from_state_dict(params_target, raw["params"])
        batch_stats = fser.from_state_dict(batch_stats_target, raw.get("batch_stats") or {})
    except (KeyError, ValueError, TypeError) as e:
        print(f"[checkpoint] best-checkpoint warm restart: restructure failed ({e}); "
              "starting fresh")
        return None
    # from_state_dict matches KEYS, not shapes — a different-sized model with the
    # same module tree restores silently and would blow up (or worse, not) later
    got, want = jax.tree.leaves(params), jax.tree.leaves(params_target)
    if len(got) != len(want) or any(
            np.shape(a) != np.shape(b) for a, b in zip(got, want)):
        print("[checkpoint] best checkpoint shapes mismatch the model; starting fresh")
        return None
    if any(not np.all(np.isfinite(np.asarray(l))) for l in jax.tree.leaves(params)):
        print("[checkpoint] best checkpoint has non-finite params; starting fresh")
        return None
    return {"params": params, "batch_stats": batch_stats,
            "epoch": int(raw["epoch"]), "test_loss": float(raw["test_loss"])}


def save_resume(ckpt_dir: str, params, batch_stats, opt_state, epoch: int,
                best_loss: float):
    """Full resume state (params + optimizer + epoch) — absent from the reference.

    Serialized with flax msgpack (optax states are NamedTuples; restoring requires the
    runtime target structure anyway, which ``load_resume`` takes)."""
    import flax.serialization as fser
    import jax

    os.makedirs(ckpt_dir, exist_ok=True)
    state = {
        "params": jax.device_get(params),
        "batch_stats": jax.device_get(batch_stats),
        "opt_state": jax.device_get(opt_state),
        "epoch": epoch,
        "best_loss": best_loss,
    }
    path = os.path.join(ckpt_dir, "resume.msgpack")
    tmp = path + ".tmp"
    with open(tmp, "wb") as fh:
        fh.write(fser.to_bytes(state))
    os.replace(tmp, path)
    return path


def load_resume(ckpt_dir: str, target):
    """Restore into ``target`` (a dict with the same structure as saved).

    Rejects non-finite restored params (a poisoned resume file from a diverged run
    must not silently seed the next run — observed in round 1 with fpe2d_unet)."""
    import flax.serialization as fser
    import numpy as np

    path = os.path.join(ckpt_dir, "resume.msgpack")
    if not os.path.exists(path):
        return None
    with open(path, "rb") as fh:
        state = fser.from_bytes(target, fh.read())
    leaves = jax.tree.leaves(state["params"])
    if any(not np.all(np.isfinite(np.asarray(l))) for l in leaves):
        quarantine = path + ".poisoned"
        os.replace(path, quarantine)
        print(f"[checkpoint] resume state has non-finite params; quarantined -> {quarantine}")
        return None
    return state
