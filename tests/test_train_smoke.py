"""End-to-end smoke: generate 1D FPE data -> train NIOFP1D a few epochs on the
8-device CPU mesh -> loss decreases, eval metric computed, checkpoint roundtrips."""
import numpy as np
import jax
import jax.numpy as jnp

from blindno.data import generate as G
from blindno.data.datasets import load_fpe1d
from blindno.models.nio1d import NIOFP1D
from blindno.train.loop import TrainConfig, train_model
from blindno.train.checkpoint import save_best, load_best


def test_train_nio1d_smoke(tmp_path):
    d = G.generate_fpe1d(seed=0, m=32, n_snapshots=12, nsteps=40)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=6)
    cfg = TrainConfig(epochs=6, batch_size=8, lr=1e-3, save_interval=3, ckpt_dir=str(tmp_path / "ckpt"))
    res = train_model(model, ds, grid, cfg)
    assert len(res.history) >= 2
    assert np.isfinite(res.best_test_loss)
    first, last = res.history[0]["train_loss"], res.history[-1]["train_loss"]
    assert last < first  # learning happens even in 6 epochs on 32 samples

    # checkpoint roundtrip
    restored = load_best(str(tmp_path / "ckpt"))
    leaves_a = jax.tree.leaves(res.best_params)
    leaves_b = jax.tree.leaves(restored["params"])
    assert len(leaves_a) == len(leaves_b)
    np.testing.assert_allclose(np.asarray(leaves_a[0]), np.asarray(leaves_b[0]))

    # restored params produce identical predictions
    x = jnp.asarray(ds.inputs[:2])
    out_a = model.apply({"params": res.best_params, "batch_stats": res.best_batch_stats}, x, jnp.asarray(grid))
    out_b = model.apply({"params": restored["params"], "batch_stats": restored["batch_stats"]}, x, jnp.asarray(grid))
    np.testing.assert_allclose(np.asarray(out_a), np.asarray(out_b), atol=1e-6)


def test_resume_continues_training(tmp_path):
    d = G.generate_fpe1d(seed=3, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    ck = str(tmp_path / "ck")
    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=1, ckpt_dir=ck)
    res1 = train_model(model, ds, grid, cfg)
    assert res1.history[-1]["epoch"] == 2

    import dataclasses
    cfg2 = dataclasses.replace(cfg, epochs=4)
    res2 = train_model(model, ds, grid, cfg2)
    # resumed run only covers epochs 3..4
    assert [h["epoch"] for h in res2.history] == [3, 4]
    assert res2.best_test_loss <= res1.best_test_loss + 1e-9


def test_warm_restart_from_best_when_resume_file_lost(tmp_path):
    """Host-wipe recovery: wipe insurance commits only the orbax best_* dirs, so
    resume.msgpack can vanish mid-run. The loop must warm-restart from the best
    checkpoint (continue at epoch+1, carry best_loss, advance the lr schedule)
    instead of silently restarting at epoch 1."""
    import os

    import dataclasses

    d = G.generate_fpe1d(seed=3, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    ck = str(tmp_path / "ck")
    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=1, ckpt_dir=ck)
    res1 = train_model(model, ds, grid, cfg)
    # simulate the wipe: only the best_* orbax dir survives
    os.remove(os.path.join(ck, "resume.msgpack"))

    best_epoch = int(load_best(ck)["epoch"])
    cfg2 = dataclasses.replace(cfg, epochs=4)
    res2 = train_model(model, ds, grid, cfg2)
    # warm restart resumes AFTER the best checkpoint's epoch, not at epoch 1
    assert res2.history[0]["epoch"] == best_epoch + 1
    assert res2.history[-1]["epoch"] == 4
    # the carried best means a worse early epoch can't overwrite the checkpoint
    assert res2.best_test_loss <= res1.best_test_loss + 1e-9

    # a mismatched model (same module tree, different shapes) falls back to a
    # fresh start (remove the resume file res2 wrote so the best_* path is hit)
    os.remove(os.path.join(ck, "resume.msgpack"))
    other = NIOFP1D(width=4, modes=4, n_basis=3, neurons=8, l_min=4)
    res3 = train_model(other, ds, grid, dataclasses.replace(cfg, epochs=1))
    assert res3.history[0]["epoch"] == 1


def test_divergence_guard_stops_training():
    """A blow-up LR produces non-finite loss; the loop must stop, not spin."""
    d = G.generate_fpe1d(seed=5, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    cfg = TrainConfig(epochs=50, batch_size=8, save_interval=1, lr=1e12)
    res = train_model(model, ds, grid, cfg)
    # stopped well before 50 epochs with no finite best
    assert len(res.history) < 10


def test_compress_inputs_trains_equivalently(tmp_path):
    """bf16 input storage (TrainConfig.compress_inputs) must train to a similar loss
    as f32 storage — compute stays f32, only the device-resident dataset is bf16."""
    import dataclasses

    d = G.generate_fpe1d(seed=7, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=1)
    res_f32 = train_model(model, ds, grid, cfg)
    res_bf16 = train_model(model, ds, grid, dataclasses.replace(cfg, compress_inputs=True))
    assert np.isfinite(res_bf16.best_test_loss)
    # quantizing inputs to bf16 (~0.4% rel) must not change training materially
    assert abs(res_bf16.best_test_loss - res_f32.best_test_loss) < 0.1 * res_f32.best_test_loss


def test_compute_dtype_bf16_mixed_precision(tmp_path):
    """TrainConfig.compute_dtype='bfloat16' (the HBM-bandwidth lever from the round-4
    profile) must (a) train to a loss comparable with f32, (b) keep master params,
    opt state, and stored batch_stats in f32 (torch-AMP-style: the cast lives inside
    the loss closure only)."""
    import dataclasses

    d = G.generate_fpe1d(seed=7, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=1)
    res_f32 = train_model(model, ds, grid, cfg)
    res_bf16 = train_model(model, ds, grid,
                           dataclasses.replace(cfg, compute_dtype="bfloat16"))
    assert np.isfinite(res_bf16.best_test_loss)
    # bf16 compute rounds activations/grads (~0.4% rel each); the 2-epoch loss must
    # stay in the same regime as f32 (not a numerics blow-up)
    assert abs(res_bf16.best_test_loss - res_f32.best_test_loss) < 0.25 * res_f32.best_test_loss
    # master state stays f32: checkpoints/resume are dtype-identical to the f32 path
    for leaf in jax.tree.leaves(res_bf16.params):
        assert leaf.dtype != jnp.bfloat16
    for leaf in jax.tree.leaves(res_bf16.batch_stats):
        assert leaf.dtype != jnp.bfloat16
    # the epoch_scan path shares the same loss closure; one epoch proves it compiles
    res_scan = train_model(model, ds, grid,
                           dataclasses.replace(cfg, epochs=1,
                                               compute_dtype="bfloat16",
                                               epoch_scan=True))
    assert np.isfinite(res_scan.best_test_loss)


def test_amp_policy_encoder(tmp_path):
    """amp_policy='encoder' must cast ONLY Encoder-scoped leaves to the compute dtype
    (the profile-guided selective-AMP mode: bf16 CNN encoder, f32 DeepONet/FNO tail)
    and still train to an f32-comparable loss with f32 master state."""
    import dataclasses

    from blindno.train.loop import amp_cast_fns

    d = G.generate_fpe1d(seed=7, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    x = jnp.asarray(ds.inputs[:2])
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.asarray(grid))

    cast, uncast = amp_cast_fns(jnp.bfloat16, "encoder")
    casted = cast(variables["params"])
    flat = jax.tree_util.tree_leaves_with_path(casted)
    enc = [(p, a) for p, a in flat if "Encoder" in jax.tree_util.keystr(p)]
    rest = [(p, a) for p, a in flat if "Encoder" not in jax.tree_util.keystr(p)]
    assert enc and rest
    assert all(a.dtype == jnp.bfloat16 for _, a in enc)
    assert all(a.dtype != jnp.bfloat16 for _, a in rest)
    # uncast restores everything to f32 exactly where cast touched it
    for a, b in zip(jax.tree.leaves(uncast(casted)), jax.tree.leaves(variables["params"])):
        assert a.dtype == b.dtype

    import pytest

    with pytest.raises(ValueError):
        amp_cast_fns(jnp.bfloat16, "bogus")

    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=1)
    res_f32 = train_model(model, ds, grid, cfg)
    res_enc = train_model(model, ds, grid,
                          dataclasses.replace(cfg, compute_dtype="bfloat16",
                                              amp_policy="encoder"))
    assert np.isfinite(res_enc.best_test_loss)
    assert abs(res_enc.best_test_loss - res_f32.best_test_loss) < 0.25 * res_f32.best_test_loss
    for leaf in jax.tree.leaves(res_enc.params):
        assert leaf.dtype != jnp.bfloat16


def test_amp_policy_encoder_bn32(tmp_path):
    """amp_policy='encoder_bn32' (torch-autocast-faithful): Encoder conv/dense leaves
    cast to bf16, Encoder BatchNorm leaves (scale/bias + running stats) stay f32, the
    non-encoder tail stays f32 — and training still runs to an f32-comparable loss."""
    import dataclasses

    from blindno.train.loop import amp_cast_fns

    d = G.generate_fpe1d(seed=7, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    x = jnp.asarray(ds.inputs[:2])
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, jnp.asarray(grid))

    cast, _ = amp_cast_fns(jnp.bfloat16, "encoder_bn32")
    for tree in (variables["params"], variables["batch_stats"]):
        flat = jax.tree_util.tree_leaves_with_path(cast(tree))
        enc_bn = [a for p, a in flat if "Encoder" in jax.tree_util.keystr(p)
                  and "BatchNorm" in jax.tree_util.keystr(p)]
        enc_rest = [a for p, a in flat if "Encoder" in jax.tree_util.keystr(p)
                    and "BatchNorm" not in jax.tree_util.keystr(p)]
        other = [a for p, a in flat if "Encoder" not in jax.tree_util.keystr(p)]
        assert enc_bn  # BN leaves exist in both params (scale/bias) and batch_stats
        assert all(a.dtype == jnp.float32 for a in enc_bn)
        assert all(a.dtype != jnp.bfloat16 for a in other)
        if tree is variables["params"]:
            assert enc_rest and all(a.dtype == jnp.bfloat16 for a in enc_rest)

    # TorchBatchNorm keeps a bf16 stream bf16 around the f32 exclusion: the encoder
    # forward under the cast must produce bf16 encoder features (cast-back semantics),
    # checked indirectly by the train path below compiling with mixed leaf dtypes.
    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=1)
    res_f32 = train_model(model, ds, grid, cfg)
    res_bn32 = train_model(model, ds, grid,
                           dataclasses.replace(cfg, compute_dtype="bfloat16",
                                               amp_policy="encoder_bn32"))
    assert np.isfinite(res_bn32.best_test_loss)
    assert abs(res_bn32.best_test_loss - res_f32.best_test_loss) < 0.25 * res_f32.best_test_loss
    for leaf in jax.tree.leaves(res_bn32.params) + jax.tree.leaves(res_bn32.batch_stats):
        assert leaf.dtype != jnp.bfloat16


def test_early_stop_patience(tmp_path, monkeypatch):
    """A constant test metric never improves past the first eval, so patience must
    end the run — and an early-stopped run counts as finished (round-4 queue
    contract)."""
    import blindno.train.loop as L

    # constant metric -> best lands at epoch 1 and never moves (deterministic;
    # the real metric would wiggle with BatchNorm running-stat drift)
    monkeypatch.setattr(L, "relative_l2_per_field",
                        lambda out, yb, ref: jnp.ones((yb.shape[0], 1)))
    d = G.generate_fpe1d(seed=9, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    cfg = TrainConfig(epochs=50, batch_size=8, save_interval=1,
                      early_stop_patience=3)
    res = train_model(model, ds, grid, cfg)
    assert res.finished
    # best at epoch 1, stop once epoch - best_epoch >= 3
    assert res.history[-1]["epoch"] == 4


def test_finished_flag_semantics(tmp_path):
    d = G.generate_fpe1d(seed=11, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    # natural completion -> finished
    res = train_model(model, ds, grid, TrainConfig(epochs=2, batch_size=8, save_interval=1))
    assert res.finished
    # stop-file preemption -> not finished
    stop = tmp_path / "STOP"
    stop.write_text("")
    res = train_model(model, ds, grid,
                      TrainConfig(epochs=4, batch_size=8, save_interval=1,
                                  stop_file=str(stop)))
    assert not res.finished
    # divergence -> not finished
    res = train_model(model, ds, grid,
                      TrainConfig(epochs=50, batch_size=8, save_interval=1, lr=1e12))
    assert not res.finished


def test_profile_dir_writes_trace(tmp_path):
    """TrainConfig.profile_dir captures one steady-state epoch (SURVEY 5.1 hook)."""
    import glob as _glob

    d = G.generate_fpe1d(seed=13, m=16, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    grid = np.linspace(0.0, 1.0, 80, dtype=np.float32).reshape(80, 1)
    model = NIOFP1D(width=8, modes=8, n_basis=5, neurons=16, l_min=4)
    prof = tmp_path / "prof"
    cfg = TrainConfig(epochs=4, batch_size=8, save_interval=2, profile_dir=str(prof))
    res = train_model(model, ds, grid, cfg)
    assert res.finished
    assert _glob.glob(str(prof / "**" / "*.xplane.pb"), recursive=True)


def test_save_best_replay_is_crash_safe(tmp_path):
    """Re-saving the SAME loss+epoch (resume replay) must never pass through a
    best-less state: the old dir is moved aside and deleted only after the new
    save lands (round-3 advisor finding)."""
    d = str(tmp_path / "ckpt")
    save_best(d, {"w": jnp.ones((3,))}, {}, epoch=7, test_loss=0.25)
    save_best(d, {"w": 3 * jnp.ones((3,))}, {}, epoch=7, test_loss=0.25)
    restored = load_best(d)
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 3.0)
    import glob as _glob
    import os as _os
    # exactly one best dir remains, and no .old residue
    leftovers = _glob.glob(_os.path.join(d, "best_*"))
    assert len(leftovers) == 1 and not leftovers[0].endswith(".old")


def test_save_best_same_rounded_loss_no_collision(tmp_path):
    """Two improvements that round to the same 6-decimal loss must both save.

    Regression: orbax StandardCheckpointer refuses to overwrite an existing
    destination, so ``best_{loss:.6f}`` alone crashed when consecutive bests
    differed only past the 6th decimal (gpe1d_vgk round 3, epochs 400/410)."""
    params = {"w": jnp.ones((3,))}
    d = str(tmp_path / "ckpt")
    save_best(d, params, {}, epoch=400, test_loss=0.0053151)
    save_best(d, {"w": 2 * jnp.ones((3,))}, {}, epoch=410, test_loss=0.0053148)
    restored = load_best(d)
    assert restored["epoch"] == 410
    np.testing.assert_allclose(np.asarray(restored["params"]["w"]), 2.0)
