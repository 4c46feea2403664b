"""Dataset generation + normalization tests (small sizes)."""
import numpy as np

from blindno.data import generate as G
from blindno.data.datasets import (
    load_fpe1d,
    load_fpe2d,
    load_gpe1d,
    load_ncfpe2d,
    train_test_split,
    eval_batches,
)


def test_generate_fpe1d_shapes():
    d = G.generate_fpe1d(seed=0, m=4, n_snapshots=10, nsteps=40)
    assert d["trajectories"].shape == (4, 10, 80)
    assert d["potential"].shape == (4, 80)
    assert d["drag"].shape == (4,)
    assert d["time"].shape == (4, 10)
    # densities: nonnegative-ish mass distributions summing to 1
    np.testing.assert_allclose(d["trajectories"].sum(-1), 1.0, rtol=1e-4)
    # potentials are attractive wells
    assert d["potential"].min() < -0.5e-20
    # snapshot times sorted
    assert (np.diff(d["time"], axis=1) >= 0).all()


def test_generate_fpe1d_store_pt():
    """store_pt=True adds the reference eval-archive fields (1d_FPE/
    dataset_gen_evaluation.py keeps the full density trajectory Pt): snapshots
    must be an exact gather of Pt at the recorded snapshot times."""
    d = G.generate_fpe1d(seed=0, m=3, n_snapshots=6, nsteps=25, store_pt=True)
    assert d["Pt"].shape == (3, 25, 80)
    assert d["time_full"].shape == (3, 25)
    np.testing.assert_allclose(d["Pt"].sum(-1), 1.0, rtol=1e-4)
    # every stored snapshot row appears verbatim in Pt at its snapshot time
    for i in range(3):
        idx = np.searchsorted(d["time_full"][i], d["time"][i])
        np.testing.assert_allclose(d["trajectories"][i], d["Pt"][i, idx], rtol=1e-6)
    # default keeps the lean archive (no Pt) and identical sampled snapshots
    lean = G.generate_fpe1d(seed=0, m=3, n_snapshots=6, nsteps=25)
    assert "Pt" not in lean
    np.testing.assert_allclose(lean["trajectories"], d["trajectories"], rtol=1e-6)


def test_generate_fpe2d_shapes():
    d = G.generate_fpe2d(seed=0, m=2, n_snapshots=5, nsteps=20, resolution=20 * G.NM,
                         extent=(300 * G.NM, 300 * G.NM))
    m, s = 2, 5
    n = d["potential"].shape[1]
    assert d["trajectories"].shape == (m, s, n, n)
    assert d["drag"].shape == (m, n, n)
    np.testing.assert_allclose(d["trajectories"].reshape(m, s, -1).sum(-1), 1.0, rtol=1e-4)


def test_generate_ncfpe2d_shapes():
    d = G.generate_ncfpe2d(seed=0, m=2, n_snapshots=5, nsteps=20, resolution=40 * G.NM,
                           extent=(400 * G.NM, 400 * G.NM))
    n = d["F"].shape[-1]
    assert d["F"].shape == (2, 2, n, n)
    assert d["trajectories"].shape == (2, 5, n, n)
    np.testing.assert_allclose(d["trajectories"].reshape(2, 5, -1).sum(-1), 1.0, rtol=2e-4)


def test_generate_gpe1d_shapes():
    d = G.generate_gpe1d(seed=0, num_orbits=3, g=0.0, kappa=0.0, nx=64, dt=0.01, t_final=0.5)
    # stride-10 subsample of nt=51 records -> 6 snapshots
    assert d["y"].shape == (3, 6, 64)
    assert d["V"].shape == (3, 64)
    assert (d["y"] >= 0).all()


def test_fpe1d_normalization_roundtrip():
    d = G.generate_fpe1d(seed=1, m=6, n_snapshots=8, nsteps=30)
    ds = load_fpe1d(d)
    assert ds.inputs.shape == (6, 8, 80)
    assert ds.targets.shape == (6, 80, 2)
    # standardized fields: ~zero mean / unit variance over samples
    assert abs(ds.targets[..., 0].mean()) < 0.2
    # denormalize returns the physical potential
    pot = np.asarray(ds.stats["potential"].denormalize(ds.targets[:, :, 0]))
    np.testing.assert_allclose(pot, d["potential"], rtol=1e-4, atol=1e-26)


def test_gpe_normalization():
    d = G.generate_gpe1d(seed=1, num_orbits=4, g=2.0, kappa=2.0, nx=64, dt=0.01, t_final=0.5)
    ds = load_gpe1d(d, thirds=True, include_gk=True)
    assert ds.targets.shape == (4, 64, 3)
    assert np.isclose(ds.inputs.max(), 3.0, rtol=1e-5)  # y / (max/3) peaks at 3


def test_split_and_eval_batches():
    tr, te = train_test_split(100, 0.8, 0)
    assert len(tr) == 80 and len(te) == 20
    assert len(set(tr) | set(te)) == 100
    bs = eval_batches(10, 4)
    assert len(bs) == 3
    idx, mask = bs[-1]
    assert mask.sum() == 2
