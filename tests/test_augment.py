"""TrainConfig.augment (D4/C4 on-device symmetry augmentation).

Validates the orientation conventions analytically against the suites' generating
families: transforming the sample *arrays* must equal re-generating the sample from
transformed *parameters* on the symmetric fplanck grid, the vector rule must commute
with taking gradients, and the NC spiral family (axisymmetric by construction,
``2d_Non_conservative_FPE/testdata_gen.py:18-25``) must be exactly invariant under
the C4 rotations used for ncfpe2d.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from blindno.data import generate as G
from blindno.data.datasets import SetToFieldData
from blindno.solvers.fokker_planck import grid_from_extent
from blindno.train.loop import TrainConfig, make_augment, train_model

NM = 1e-9


def _grid2d(extent_nm=600):
    axes = [np.asarray(a) for a in grid_from_extent((extent_nm * NM,) * 2, 10 * NM)]
    return np.meshgrid(axes[0], axes[1], indexing="ij")


def _wells(gx, gy, centers, widths, amps):
    d2 = ((gx[None] - centers[:, 0, None, None]) ** 2
          + (gy[None] - centers[:, 1, None, None]) ** 2)
    return -(amps[:, None, None] * np.exp(-d2 / widths[:, None, None] ** 2)).sum(axis=0)


# D4 element i of make_augment("d4_scalar") acts on data as rot^k o flip^s with
# rot = +90deg CCW; on generating parameters (points) that is c' = R^k(S(c)),
# R(x, y) = (-y, x), S(x, y) = (x, -y).
def _d4_on_points(pts, i):
    k, s = i % 4, i // 4
    out = pts.copy()
    if s:
        out = out * np.array([1.0, -1.0])
    for _ in range(k):
        out = np.stack([-out[:, 1], out[:, 0]], axis=1)
    return out


def test_d4_scalar_matches_parameter_transform():
    """Array transform == re-generating the wells at transformed centers (exact on
    the symmetric grid — this is what makes the augmentation distribution-exact
    for fpe2d)."""
    rng = np.random.default_rng(0)
    gx, gy = _grid2d(600)
    centers = rng.uniform(-100 * NM, 100 * NM, size=(3, 2))
    widths = rng.uniform(20 * NM, 80 * NM, size=3)
    amps = rng.uniform(1e-20, 2e-20, size=3)
    u = _wells(gx, gy, centers, widths, amps)

    fns = make_augment("d4_scalar")
    assert len(fns) == 8
    x = jnp.asarray(u)[None, None]          # (1, 1, N, N)
    y = jnp.asarray(u)[None, ..., None]     # (1, N, N, 1)
    # the transform is an exact permutation; the comparison tolerance only absorbs
    # f32-vs-f64 evaluation differences in the far exponential tails
    atol = 1e-6 * np.abs(u).max()
    for i, f in enumerate(fns):
        xt, yt = f(x, y)
        expected = _wells(gx, gy, _d4_on_points(centers, i), widths, amps)
        np.testing.assert_allclose(np.asarray(xt)[0, 0], expected, atol=atol)
        np.testing.assert_allclose(np.asarray(yt)[0, ..., 0], expected, atol=atol)
    # element 0 is the identity
    xt, yt = fns[0](x, y)
    np.testing.assert_array_equal(np.asarray(xt), np.asarray(x))


def test_c4_vector_commutes_with_gradient():
    """Rotating a gradient field with the vector rule == gradient of the rotated
    scalar (np.gradient is a symmetric stencil, so this pins both the spatial map
    and the component mixing)."""
    rng = np.random.default_rng(1)
    gx, gy = _grid2d(600)
    centers = rng.uniform(-100 * NM, 100 * NM, size=(3, 2))
    u = _wells(gx, gy, centers, np.full(3, 50 * NM), np.full(3, 1e-20))
    res = 10 * NM
    grad = np.stack(np.gradient(u, res, res), axis=-1)  # (N, N, 2) = (dU/dx, dU/dy)

    scalar = make_augment("d4_scalar")
    vector = make_augment("c4_vector")
    assert len(vector) == 4
    atol = 1e-5 * np.abs(grad).max()
    for k in range(1, 4):
        _, u_rot = scalar[k](jnp.asarray(u)[None, None], jnp.asarray(u)[None, ..., None])
        grad_of_rot = np.stack(np.gradient(np.asarray(u_rot)[0, ..., 0], res, res), axis=-1)
        _, rot_of_grad = vector[k](jnp.zeros((1, 1) + u.shape), jnp.asarray(grad)[None])
        np.testing.assert_allclose(np.asarray(rot_of_grad)[0], grad_of_rot, atol=atol)


def test_spiral_family_invariant_under_c4():
    """The NC spiral force depends on radius only, so the C4 vector transform maps
    every sample to itself — rotated targets (and their normalization stats) are
    exactly in-distribution."""
    rng = np.random.default_rng(2)
    gx, gy = _grid2d(800)
    f = G._spiral_on_grid(gx, gy, G.sample_ncfpe2d_params(rng, 3))  # (3, 2, N, N)
    y = jnp.asarray(np.moveaxis(f, 1, -1))  # (3, N, N, 2), loader layout
    x = jnp.zeros((3, 1) + gx.shape)
    scale = np.abs(f).max()
    for k, fn in enumerate(make_augment("c4_vector")):
        _, yt = fn(x, y)
        np.testing.assert_allclose(np.asarray(yt) / scale, np.asarray(y) / scale,
                                   atol=1e-6, err_msg=f"k={k}")


def test_train_with_augment_smoke():
    """Augmented 2-D training runs under jit and stays finite (exercises the
    lax.switch + rng plumbing in train_model; model internals are covered
    elsewhere — a tiny module keeps this a seconds-scale compile)."""
    import flax.linen as nn

    class _Tiny(nn.Module):
        @nn.compact
        def __call__(self, x, grid, *, training: bool = False):
            h = x.mean(axis=1)[..., None]  # (B, H, W, 1)
            g = jnp.broadcast_to(grid[None], (x.shape[0],) + grid.shape)
            return nn.Dense(2)(jnp.concatenate([h, g], axis=-1))

    rng = np.random.default_rng(3)
    n = 12
    inputs = rng.standard_normal((16, 6, n, n)).astype(np.float32)
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    grid = np.stack(np.meshgrid(lin, lin, indexing="ij"), axis=-1)
    # rotation-consistent target: a radial vector field (so the augmented problem
    # is self-consistent)
    rad = np.stack([grid[..., 0], grid[..., 1]], axis=-1)
    targets = np.broadcast_to(rad, (16, n, n, 2)).astype(np.float32).copy()
    ds = SetToFieldData(inputs, targets, {})

    cfg = TrainConfig(epochs=2, batch_size=8, save_interval=1, augment="c4_vector")
    res = train_model(_Tiny(), ds, grid, cfg)
    assert np.isfinite(res.best_test_loss)
    assert len(res.history) == 2


def test_flip1d_matches_parameter_transform():
    """fpe1d: flipping the arrays == re-generating wells at negated centers;
    GPE: flipping V == the V-family member with x0 -> -x0."""
    rng = np.random.default_rng(6)
    fns = make_augment("flip1d")
    assert len(fns) == 2

    x = np.asarray(grid_from_extent(800 * NM, 10 * NM)[0])
    centers = rng.uniform(-150 * NM, 150 * NM, size=(1, 3))
    widths = rng.uniform(20 * NM, 80 * NM, size=(1, 3))
    amps = rng.uniform(1e-20, 2e-20, size=(1, 3))
    u = G._wells_on_grid(x, centers, widths, amps)  # (1, 80)
    xt, yt = fns[1](jnp.asarray(u)[:, None, :], jnp.asarray(u)[..., None])
    expected = G._wells_on_grid(x, -centers, widths, amps)
    np.testing.assert_allclose(np.asarray(xt)[:, 0], expected,
                               atol=1e-6 * np.abs(u).max())
    np.testing.assert_allclose(np.asarray(yt)[..., 0], expected,
                               atol=1e-6 * np.abs(u).max())

    xg = np.linspace(-10.0, 10.0, 128)
    a, b, c, x0 = 0.2, 1.3, 1.7, 2.1
    v = a * (xg - x0) ** 2 + b * np.cos(c * (xg - x0)) ** 2
    v_neg = a * (xg + x0) ** 2 + b * np.cos(c * (xg + x0)) ** 2
    _, vt = fns[1](jnp.zeros((1, 1, 128)), jnp.asarray(v)[None, :, None])
    np.testing.assert_allclose(np.asarray(vt)[0, :, 0], v_neg, rtol=1e-6)

    # both elements are involutions and tta_indices says so
    from blindno.eval.field_eval import tta_indices
    assert tta_indices("flip1d") == [0, 1]
    _, back = fns[1](jnp.zeros((1, 1, 128)), vt)
    np.testing.assert_allclose(np.asarray(back)[0, :, 0], v, rtol=1e-6)


def test_tta_inverse_indices():
    """fns[tta_indices(kind)[i]] undoes fns[i] on the target side."""
    from blindno.eval.field_eval import tta_indices

    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.standard_normal((2, 3, 6, 6)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((2, 6, 6, 2)).astype(np.float32))
    for kind in ("d4_scalar", "c4_vector"):
        fns = make_augment(kind)
        inv = tta_indices(kind)
        for i, f in enumerate(fns):
            _, yt = f(x, y)
            _, y_back = fns[inv[i]](x, yt)
            np.testing.assert_allclose(np.asarray(y_back), np.asarray(y), rtol=1e-6,
                                       err_msg=f"{kind} element {i}")


def test_tta_equals_plain_for_equivariant_model():
    """For a D4-equivariant model, symmetry ensembling is a no-op — pins the
    forward-transform / inverse-transform pairing in predict_fields_tta."""
    import flax.linen as nn

    from blindno.eval.field_eval import predict_fields_tta

    class _Equiv(nn.Module):
        @nn.compact
        def __call__(self, x, grid, *, training: bool = False):
            m = x.mean(axis=1)
            return jnp.stack([m, 2.0 * m], axis=-1)  # scalar-equivariant under D4

    rng = np.random.default_rng(5)
    n = 8
    x = rng.standard_normal((6, 4, n, n)).astype(np.float32)
    lin = np.linspace(-1, 1, n, dtype=np.float32)
    grid = jnp.asarray(np.stack(np.meshgrid(lin, lin, indexing="ij"), axis=-1))
    model = _Equiv()
    plain = np.asarray(model.apply({"params": {}, "batch_stats": {}},
                                   jnp.asarray(x), grid, training=False))
    tta = predict_fields_tta(model, {}, {}, x, grid, "d4_scalar", batch=4)
    np.testing.assert_allclose(tta, plain, rtol=1e-5)


def test_augment_rejects_non_square():
    ds = SetToFieldData(np.zeros((4, 3, 8, 10), np.float32),
                        np.zeros((4, 8, 10, 1), np.float32), {})
    cfg = TrainConfig(epochs=1, batch_size=2, augment="d4_scalar")
    with pytest.raises(ValueError, match="square"):
        train_model(object(), ds, np.zeros((8, 10, 2), np.float32), cfg)
