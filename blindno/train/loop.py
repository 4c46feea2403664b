"""jit-compiled training loop with data-parallel sharding and epoch-level fusion.

Re-design of the reference's per-script epoch loops (``1d_FPE/train_nio.py:95-200``,
DDP variant ``2d_FPE/train_nio.py:75-143``): Adam + StepLR(100 epochs, x0.5), MSE loss,
periodic per-field rel-L2 test metrics, best-checkpoint retention.

TPU-first differences:
- the ENTIRE epoch is one ``lax.scan`` inside one jit call: the dataset is device
  resident, batches are device-side gathers of a precomputed permutation, so there are
  zero host->device round trips inside an epoch (the reference pays a DataLoader +
  dispatch round trip per step);
- data parallelism is a ``NamedSharding`` over a 1-D ``Mesh('data')`` — XLA inserts the
  gradient all-reduce over ICI; the same code runs on 1 chip (mesh of 1) or N;
- the train-time set subsampling randomness is an explicit PRNG stream (one key per
  step, fed through the scan).
"""
from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np
import optax
from flax.core import freeze
from jax.sharding import NamedSharding, PartitionSpec as P

from blindno.data.datasets import SetToFieldData, eval_batches, train_test_split
from blindno.eval.metrics import relative_l2_per_field
from blindno.parallel.mesh import data_mesh, data_model_mesh, replicate
from blindno.parallel.tp import tp_shard_params
from blindno.utils.logging import MetricsLogger


@dataclass
class TrainConfig:
    epochs: int = 400
    batch_size: int = 32
    lr: float = 1e-3
    lr_step_epochs: int = 100
    lr_gamma: float = 0.5
    save_interval: int = 10
    seed: int = 0
    split_seed: int = 0
    train_frac: float = 0.8
    reference_denominator: bool = True
    log_path: str | None = None
    ckpt_dir: str | None = None
    # Fuse the whole epoch into one lax.scan device program. Best when per-step host
    # dispatch dominates (many tiny steps); costs one large XLA compile up front. The
    # per-step path compiles ~40x faster and reaches similar steady-state throughput
    # on a single chip, so it is the default.
    epoch_scan: bool = False
    # Resume from {ckpt_dir}/resume.msgpack when present (params + optimizer + epoch);
    # resume state is written at every eval interval. The reference has no resume path.
    resume: bool = True
    # Graceful preemption: if this file appears, finish the epoch, save resume state,
    # and return (training continues from there on the next invocation).
    stop_file: str | None = None
    # Store the device-resident INPUT snapshots in bf16 (targets stay f32; every
    # batch is cast back to f32 right after the gather, so all compute is f32).
    # Halves HBM residency for large datasets (fpe2d m=8000 is ~12 GB in f32 vs a
    # 16 GB chip); input quantization is ~0.4% relative, far below the snapshot
    # information content the models use.
    compress_inputs: bool = False
    # Tensor-parallel axis size: params/optimizer state shard their out-channel dims
    # over a 'model' mesh axis (blindno.parallel.tp) and the batch shards over the
    # remaining 'data' axis — a DPxTP mesh, like the multichip dryrun
    # (__graft_entry__.dryrun_multichip). 1 = pure DP (the reference is DDP-only).
    tp: int = 1
    # On-device symmetry augmentation for the square-grid 2-D suites (an exact,
    # zero-datagen-cost effective-data multiplier the torch reference does not have):
    #   "d4_scalar": all 8 rot90/flip elements of the square's symmetry group applied
    #     to (snapshots, scalar target fields). Exact for fpe2d: the well/drag/IC
    #     parameter distribution is D4-invariant and the grid is symmetric, so each
    #     transformed sample is a valid draw from the same distribution.
    #   "c4_vector": the 4 rotations, with target vector components mixed by the
    #     rotation matrix. For ncfpe2d the spiral force family is axisymmetric, so
    #     rotated targets (and their normalization stats) map to themselves exactly;
    #     only the off-center IC moves — rotated snapshot sets are still valid
    #     solutions for the same force field, regularizing the encoder against the
    #     10x train/test gap observed at m=1200. Reflections would flip the spiral
    #     chirality out of the training family and are excluded.
    # One random group element per step (uniform, incl. identity); eval is never
    # augmented. Requires 4-D inputs (B, L, H, W) with H == W.
    #
    # Exactness caveat (round-3 advisor): the group transform is exact on the raw
    # fields at the population level, but the FPE suites normalize with per-gridpoint
    # empirical train-set stats, which are only group-symmetric up to O(sigma/sqrt(m))
    # sampling noise — augmented labels therefore carry that much orientation noise.
    # The GPE suites use a global scalar /max, which commutes exactly.
    augment: str | None = None
    # Mixed-precision compute: "bfloat16" casts params, batch-norm state, and the
    # batch to bf16 INSIDE the loss closure, so every encoder activation, conv, and
    # weight-gradient reduction streams half the bytes (the round-4 profile shows the
    # 2-D step is HBM-bandwidth-bound on exactly those f32 activation stacks —
    # runs/logs/profile_r04_analysis.md). Master params, Adam state, the loss, the
    # gradients (accumulated through the cast), batch-stats storage, and eval all stay
    # f32, i.e. torch-AMP-style mixed precision rather than a half-precision model.
    # None (default) = pure f32 storage+compute, the accuracy-validated parity path.
    compute_dtype: str | None = None
    # Which params/batch-stats the compute_dtype cast touches:
    #   "all":     every f32 leaf (the round-4 validated-and-FAILED full-bf16 mode:
    #              fpe1d/nio trained 30% worse — runs/logs/fpe1d_nio_bf16val_allbf16_
    #              summary.json).
    #   "encoder": only leaves whose tree path contains "Encoder" — the CNN snapshot
    #              encoder, which the round-4 profile pins at >=95% of NIO step time
    #              (conv weight-gradients + BN over the (B*L, H, W) activation stack).
    #              The numerically sensitive tail (DeepONet branch/trunk contraction,
    #              spectral-conv DFT matmuls, FNO heads) stays f32: its activations are
    #              per-sample (L-fold smaller), so it contributes little bandwidth but
    #              all of the full-bf16 mode's observed accuracy loss. bf16 encoder
    #              outputs promote back to f32 at the first f32-weight contraction.
    #              FAILED its round-5 gate too (fpe1d/nio 0.2042 vs needed 0.1896 —
    #              runs/logs/fpe1d_nio_bf16val_enc_summary.json).
    #   "encoder_bn32": "encoder" minus BatchNorm leaves (torch autocast's fp32
    #              list): conv/dense compute and activations stream bf16, BN affine
    #              params + running stats stay exactly f32 — removing the per-step
    #              stat quantization and the train/eval normalization mismatch the
    #              "encoder" gate failures are attributed to. PASSED the round-5
    #              gate (fpe1d/nio 0.1822 vs f32 0.1806, tol 1.05x —
    #              runs/logs/fpe1d_nio_bf16val_summary.json); this is the
    #              validated bench-headline mode.
    # Ignored when compute_dtype is None. Only meaningful for NIO-family models
    # (UNet param trees have no "Encoder" scope — "encoder" casts nothing there).
    amp_policy: str = "all"
    # Early stop: end the run when the best test loss has not improved for this many
    # epochs (checked at eval intervals; None = reference-exact fixed-epoch behavior).
    # A run stopped this way counts as finished (TrainResult.finished) — the best
    # checkpoint is already saved and StepLR has decayed far below its plateau.
    # On resume the patience counter restarts from the resumed epoch (resume state
    # does not record the best epoch).
    early_stop_patience: int | None = None
    # When set, write one jax.profiler trace of a single steady-state epoch
    # (start_epoch+2, after compile) under this directory (SURVEY 5.1 hook).
    profile_dir: str | None = None


@dataclass
class TrainResult:
    params: Any
    batch_stats: Any
    best_params: Any
    best_batch_stats: Any
    best_test_loss: float
    history: list = dc_field(default_factory=list)
    # True when the run ended on its own terms (all epochs, or early-stop patience
    # exhausted) rather than by preemption/divergence — drivers use this to decide
    # whether to write the run's summary or leave it resumable.
    finished: bool = False


def amp_cast_fns(cdtype, policy: str = "all"):
    """(cast_tree, uncast_tree) for TrainConfig.compute_dtype / amp_policy.

    ``cast_tree`` casts the selected f32 leaves to ``cdtype`` inside the loss
    closure (autodiff of the cast accumulates gradients back to the f32 master
    leaves); ``uncast_tree`` restores any ``cdtype`` leaf to f32 so stored state
    (batch stats, checkpoints) never changes dtype. Policy "encoder" selects only
    leaves whose path mentions an Encoder scope — see TrainConfig.amp_policy.
    """
    if policy == "all":
        pred = None
    elif policy == "encoder":
        def pred(path):
            return any("Encoder" in str(getattr(k, "key", k)) for k in path)
    elif policy == "encoder_bn32":
        # torch-AMP-faithful selective cast: Encoder conv/dense leaves go bf16, but
        # BatchNorm scale/bias/running-stats stay f32 (autocast's fp32 list). The
        # 'encoder' policy quantized those to bf16 on every use, which both noised
        # the running-stat EMA and made the f32 eval path normalize with stats the
        # bf16 train path never saw; TorchBatchNorm's f32-compute + cast-back keeps
        # the activation stream bf16 around the exclusion.
        def pred(path):
            keys = [str(getattr(k, "key", k)) for k in path]
            return any("Encoder" in k for k in keys) and not any(
                "BatchNorm" in k for k in keys)
    else:
        raise ValueError(
            f"unknown amp_policy {policy!r} (want 'all', 'encoder' or 'encoder_bn32')")

    def cast_tree(t):
        if pred is None:
            return jax.tree.map(
                lambda a: a.astype(cdtype) if a.dtype == jnp.float32 else a, t)
        return jax.tree_util.tree_map_with_path(
            lambda p, a: a.astype(cdtype) if (a.dtype == jnp.float32 and pred(p)) else a, t)

    def uncast_tree(t):
        # only cast_tree-produced leaves are cdtype, so restoring every cdtype
        # leaf is policy-independent
        return jax.tree.map(
            lambda a: a.astype(jnp.float32) if a.dtype == cdtype else a, t)

    return cast_tree, uncast_tree


def _rotate_vec2(y, k: int):
    """Rotate the last-axis (vx, vy) components by k * 90 deg CCW: (vx,vy)->(-vy,vx)."""
    for _ in range(k % 4):
        y = jnp.stack([-y[..., 1], y[..., 0]], axis=-1)
    return y


def make_augment(kind: str | None):
    """Batch-transform branches for TrainConfig.augment (see the field's docstring).

    Returns a list of fns (x: (B,L,H,W), y: (B,H,W,F)) -> (x, y), one per group
    element, for use with ``lax.switch``. Orientation convention: grid axis 0 is x,
    axis 1 is y (``np.meshgrid(..., indexing='ij')``); a +90 deg rotation maps the
    sample arrays by A'[i, j] = A[j, N-1-i], which is ``jnp.rot90`` with k=1 on the
    spatial axes, and mixes vector components by (vx, vy) -> (-vy, vx).
    """
    if kind is None:
        return None

    def mk(k: int, flip: bool, vector: bool):
        def f(x, y):
            if flip:  # reflection y -> -y (axis 1 of the grid)
                x = jnp.flip(x, axis=3)
                y = jnp.flip(y, axis=2)
            x = jnp.rot90(x, k=k, axes=(2, 3))
            y = jnp.rot90(y, k=k, axes=(1, 2))
            if vector:
                y = _rotate_vec2(y, k)
            return x, y

        return f

    if kind == "d4_scalar":
        return [mk(k, fl, False) for fl in (False, True) for k in range(4)]
    if kind == "c4_vector":
        return [mk(k, False, True) for k in range(4)]
    if kind == "flip1d":
        # parity x -> -x for the 1-D suites: the well/V-potential parameter
        # distributions are symmetric about 0 and the grids are symmetric
        # (fpe1d: (arange(n)-(n-1)/2)*res; GPE: linspace(-10,10,128)), so the
        # flipped (snapshots, fields) pair is an exact draw from the same
        # distribution (for GPE, |psi(-x,t)| solves with V(-x) since the
        # sin(x)/cosh(x) IC is odd — a global -1 phase that |.| erases).
        return [
            lambda x, y: (x, y),
            lambda x, y: (jnp.flip(x, axis=2), jnp.flip(y, axis=1)),
        ]
    raise ValueError(f"unknown augment kind: {kind!r}")


def step_lr(lr: float, gamma: float, step_epochs: int, steps_per_epoch: int):
    """torch StepLR(step_size, gamma) as an optax schedule on the global step."""

    def schedule(step):
        epoch = step // max(steps_per_epoch, 1)
        return lr * gamma ** (epoch // step_epochs)

    return schedule


def train_model(model, data: SetToFieldData, grid, cfg: TrainConfig, *,
                progress: Callable | None = None) -> TrainResult:
    """Full training run. ``model`` is a flax module taking (x, grid, training=...)."""
    aug_fns = make_augment(cfg.augment)
    if cfg.augment == "flip1d":
        if data.inputs.ndim != 3:
            raise ValueError(
                f"augment='flip1d' needs (B, L, Nx) inputs, got {data.inputs.shape}")
    elif aug_fns is not None and (
        data.inputs.ndim != 4 or data.inputs.shape[2] != data.inputs.shape[3]
    ):
        raise ValueError(
            f"augment={cfg.augment!r} needs square (B, L, H, W) inputs, "
            f"got {data.inputs.shape}")
    if cfg.tp > 1:
        mesh = data_model_mesh(cfg.tp)
        n_data = mesh.shape["data"]
        if cfg.batch_size % n_data != 0:
            raise ValueError(
                f"batch_size={cfg.batch_size} not divisible by the data axis "
                f"({n_data} = {len(jax.devices())} devices / tp={cfg.tp})")
    else:
        mesh = data_mesh(batch_size=cfg.batch_size)
    # params/opt-state placement: TP shards out-channel dims over 'model', pure DP
    # replicates; batches always shard over 'data'
    place = (lambda t: tp_shard_params(t, mesh)) if cfg.tp > 1 else (lambda t: replicate(t, mesh))
    dp = NamedSharding(mesh, P("data"))
    n = data.inputs.shape[0]
    train_idx, test_idx = train_test_split(n, cfg.train_frac, cfg.split_seed)
    # datasets are device-resident (replicated; batches are device-side gathers)
    in_dtype = jnp.bfloat16 if cfg.compress_inputs else jnp.asarray(data.inputs[:1]).dtype
    x_train = replicate(jnp.asarray(data.inputs[train_idx], dtype=in_dtype), mesh)
    y_train = replicate(jnp.asarray(data.targets[train_idx]), mesh)
    x_test = replicate(jnp.asarray(data.inputs[test_idx], dtype=in_dtype), mesh)
    y_test = replicate(jnp.asarray(data.targets[test_idx]), mesh)
    grid = jnp.asarray(grid)

    key = jax.random.PRNGKey(cfg.seed)
    key, init_key = jax.random.split(key)
    init_x = jnp.asarray(data.inputs[: max(2, min(cfg.batch_size, 4))])
    # jit the init: eager tracing dispatches thousands of tiny ops (very slow on a
    # remote-tunneled TPU); compiled init is one program
    variables = jax.jit(model.init)({"params": init_key, "sample": init_key}, init_x, grid)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", freeze({}))
    params = place(params)
    batch_stats = replicate(batch_stats, mesh)

    steps_per_epoch = train_idx.shape[0] // cfg.batch_size
    if steps_per_epoch == 0:
        raise ValueError(
            f"batch_size={cfg.batch_size} exceeds the train split "
            f"({train_idx.shape[0]} samples) — no steps would run; lower batch_size or add data"
        )
    schedule = step_lr(cfg.lr, cfg.lr_gamma, cfg.lr_step_epochs, steps_per_epoch)
    tx = optax.adam(schedule)
    opt_state = place(tx.init(params))

    start_epoch = 1
    best_loss = float("inf")
    if cfg.resume and cfg.ckpt_dir:
        from blindno.train.checkpoint import load_resume

        target = {"params": jax.device_get(params), "batch_stats": jax.device_get(batch_stats),
                  "opt_state": jax.device_get(opt_state), "epoch": 0, "best_loss": 0.0}
        restored = load_resume(cfg.ckpt_dir, target)
        if restored is not None:
            params = place(restored["params"])
            batch_stats = replicate(restored["batch_stats"], mesh)
            opt_state = place(restored["opt_state"])
            start_epoch = int(restored["epoch"]) + 1
            best_loss = float(restored["best_loss"])
            # keep the PRNG stream distinct per resumed segment
            key = jax.random.fold_in(key, start_epoch)
        else:
            # Host-wipe fallback: resume.msgpack never survives a wipe (only the
            # orbax best_* dirs are wipe-insured into git). Warm restart from the
            # best checkpoint instead of discarding the lost run: params/best_loss/
            # epoch come from the checkpoint; Adam moments restart at zero but the
            # optimizer step count is advanced so the StepLR schedule continues
            # where the lost run was (a warm restart, not an exact resume).
            from blindno.train.checkpoint import load_best_as_warm_restart

            best = load_best_as_warm_restart(
                cfg.ckpt_dir, target["params"], target["batch_stats"])
            if best is not None and best["epoch"] >= 1:
                params = place(best["params"])
                batch_stats = replicate(best["batch_stats"], mesh)
                start_epoch = best["epoch"] + 1
                best_loss = best["test_loss"]
                done_steps = (start_epoch - 1) * steps_per_epoch
                opt_state = place(jax.tree.map(
                    lambda x: np.full_like(x, done_steps)
                    if (np.ndim(x) == 0 and np.issubdtype(np.asarray(x).dtype, np.integer))
                    else x,
                    target["opt_state"]))
                key = jax.random.fold_in(key, start_epoch)
                print(f"[train] resume.msgpack absent; warm restart from best_* at "
                      f"epoch {best['epoch']} (best {best_loss:.6f}; Adam moments "
                      f"reset, lr schedule advanced to step {done_steps})")

    def apply(variables, x, training, rngs=None, mutable=False):
        return model.apply(variables, x, grid, training=training, rngs=rngs, mutable=mutable)

    # Mixed precision (cfg.compute_dtype): the cast lives INSIDE the loss closure, so
    # autodiff of the cast accumulates the gradients back to f32 master params; the
    # returned batch stats are re-cast to f32 so the stored training state never
    # changes dtype (checkpoints/resume stay f32 regardless of compute_dtype).
    cdtype = jnp.dtype(cfg.compute_dtype) if cfg.compute_dtype else jnp.float32
    if cfg.compute_dtype:
        cast_tree, uncast_tree = amp_cast_fns(cdtype, cfg.amp_policy)
    else:
        cast_tree = uncast_tree = lambda t: t

    def train_loss_and_grads(params, batch_stats, xb, yb, rng):
        def loss_fn(p):
            out, updates = apply(
                {"params": cast_tree(p), "batch_stats": cast_tree(batch_stats)},
                xb.astype(cdtype), True, rngs={"sample": rng}, mutable=["batch_stats"],
            )
            return (jnp.mean((out.astype(jnp.float32) - yb) ** 2),
                    uncast_tree(updates["batch_stats"]))

        return jax.value_and_grad(loss_fn, has_aux=True)(params)

    def augmented(xb, yb, rng):
        """One random symmetry-group element per step (identity included)."""
        if aug_fns is None:
            return xb, yb, rng
        rng, ak = jax.random.split(rng)
        branch = jax.random.randint(ak, (), 0, len(aug_fns))
        xb, yb = jax.lax.switch(branch, aug_fns, xb, yb)
        return xb, yb, rng

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_epoch(params, batch_stats, opt_state, x_all, y_all, batch_idx, step_keys):
        """One epoch fused into a single device program (scan over batches)."""

        def body(carry, xs):
            params, batch_stats, opt_state = carry
            idx, rng = xs
            xb = jax.lax.with_sharding_constraint(
                jnp.take(x_all, idx, axis=0).astype(jnp.float32), dp)
            yb = jax.lax.with_sharding_constraint(jnp.take(y_all, idx, axis=0), dp)
            xb, yb, rng = augmented(xb, yb, rng)
            (loss, new_stats), grads = train_loss_and_grads(params, batch_stats, xb, yb, rng)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, new_stats, opt_state), loss

        (params, batch_stats, opt_state), losses = jax.lax.scan(
            body, (params, batch_stats, opt_state), (batch_idx, step_keys)
        )
        return params, batch_stats, opt_state, losses.mean()

    @partial(jax.jit, donate_argnums=(0, 1, 2))
    def train_step(params, batch_stats, opt_state, x_all, y_all, idx, rng):
        # dataset arrays are explicit args (closed-over device arrays would be
        # captured as multi-GB lowering constants)
        xb = jax.lax.with_sharding_constraint(
            jnp.take(x_all, idx, axis=0).astype(jnp.float32), dp)
        yb = jax.lax.with_sharding_constraint(jnp.take(y_all, idx, axis=0), dp)
        xb, yb, rng = augmented(xb, yb, rng)
        (loss, new_stats), grads = train_loss_and_grads(params, batch_stats, xb, yb, rng)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), new_stats, opt_state, loss

    @jax.jit
    def eval_step(params, batch_stats, x_all, y_all, idx, sample_mask):
        xb = jnp.take(x_all, idx, axis=0).astype(jnp.float32)
        yb = jnp.take(y_all, idx, axis=0)
        out = apply({"params": params, "batch_stats": batch_stats}, xb, False)
        errs = relative_l2_per_field(out, yb, cfg.reference_denominator)  # (B, F)
        return (errs * sample_mask[:, None]).sum(axis=0)

    logger = MetricsLogger(cfg.log_path)
    # copy, don't alias: params/batch_stats buffers are donated to train_step, so an
    # aliased best_params would reference deleted arrays if no eval ever improves it
    best_params = jax.tree.map(lambda a: a.copy(), params)
    best_stats = jax.tree.map(lambda a: a.copy(), batch_stats)
    history = []
    n_test = test_idx.shape[0]
    test_batches = [
        (jnp.asarray(i), jnp.asarray(m)) for i, m in eval_batches(n_test, cfg.batch_size)
    ]

    best_epoch = start_epoch - 1
    finished = True  # any break below (divergence/preemption) flips it
    tracing = False
    for epoch in range(start_epoch, cfg.epochs + 1):
        if cfg.profile_dir:
            # one steady-state epoch (after the compile epoch), SURVEY 5.1 hook
            if epoch == start_epoch + 2:
                jax.profiler.start_trace(cfg.profile_dir)
                tracing = True
            elif tracing:
                jax.profiler.stop_trace()
                tracing = False
        key, pk, sk = jax.random.split(key, 3)
        perm = jax.random.permutation(pk, train_idx.shape[0])
        batch_idx = perm[: steps_per_epoch * cfg.batch_size].reshape(steps_per_epoch, cfg.batch_size)
        step_keys = jax.random.split(sk, steps_per_epoch)
        t0 = time.perf_counter()
        if cfg.epoch_scan:
            params, batch_stats, opt_state, train_loss = train_epoch(
                params, batch_stats, opt_state, x_train, y_train, batch_idx, step_keys
            )
            train_loss = float(train_loss)
        else:
            losses = []
            for i in range(steps_per_epoch):
                params, batch_stats, opt_state, loss = train_step(
                    params, batch_stats, opt_state, x_train, y_train, batch_idx[i], step_keys[i]
                )
                losses.append(loss)
            train_loss = float(jnp.stack(losses).mean())
        dt = time.perf_counter() - t0

        if not np.isfinite(train_loss):
            # divergence guard: stop immediately; the last finite resume state (if
            # any) is what a future invocation continues from
            logger.log({"event": "diverged", "epoch": epoch, "train_loss": train_loss})
            finished = False
            break

        if epoch % cfg.save_interval == 0 or epoch == cfg.epochs:
            field_sums = None
            for idx, mask in test_batches:
                s = eval_step(params, batch_stats, x_test, y_test, idx, mask)
                field_sums = s if field_sums is None else field_sums + s
            field_means = np.asarray(field_sums) / n_test
            test_loss = float(field_means.sum())
            record = {
                "epoch": epoch,
                "train_loss": train_loss,
                "test_loss": test_loss,
                "field_rel_l2": field_means.tolist(),
                "steps_per_sec": steps_per_epoch / dt,
            }
            history.append(record)
            logger.log(record)
            if progress:
                progress(record)
            if not np.isfinite(test_loss):
                # never checkpoint a poisoned state: a NaN test loss means the params
                # are already non-finite; stop and leave the last finite resume state
                logger.log({"event": "diverged", "epoch": epoch, "test_loss": test_loss})
                finished = False
                break
            if test_loss < best_loss:
                best_loss = test_loss
                best_epoch = epoch
                best_params = jax.tree.map(lambda a: a.copy(), params)
                best_stats = jax.tree.map(lambda a: a.copy(), batch_stats)
                if cfg.ckpt_dir:
                    from blindno.train.checkpoint import save_best

                    save_best(cfg.ckpt_dir, best_params, best_stats, epoch, best_loss)
            if cfg.ckpt_dir:
                from blindno.train.checkpoint import save_resume

                save_resume(cfg.ckpt_dir, params, batch_stats, opt_state, epoch, best_loss)
            if (cfg.early_stop_patience is not None
                    and epoch - best_epoch >= cfg.early_stop_patience):
                logger.log({"event": "early_stop", "epoch": epoch,
                            "best_epoch": best_epoch, "best_loss": best_loss})
                break

        if cfg.stop_file and __import__("os").path.exists(cfg.stop_file):
            if cfg.ckpt_dir:
                from blindno.train.checkpoint import save_resume

                save_resume(cfg.ckpt_dir, params, batch_stats, opt_state, epoch, best_loss)
            logger.log({"event": "preempted", "epoch": epoch})
            finished = False
            break

    logger.close()
    if tracing:  # loop ended before the epoch after the traced one
        jax.profiler.stop_trace()
    return TrainResult(params, batch_stats, best_params, best_stats, best_loss, history,
                       finished=finished)
