"""Shape / permutation-invariance tests for 2-D NIO models and the BlinDNO UNets."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.models.nio2d import NIOFP2D, NIOFNO2D, NIOTrans2D, NIOTransAttn2D, NIOFNOAttn2D, NIOAttn2D
from blindno.models.blindno_unet import PermInvUNetAttn, _unet_shapes


def _data(rng, b=1, l=4, nx=61, ny=61):
    x = jnp.asarray(rng.standard_normal((b, l, nx, ny)).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, nx), np.linspace(-1, 1, ny), indexing="ij")
    grid = jnp.asarray(np.stack([gx, gy], axis=2).astype(np.float32))
    return x, grid


SMALL = dict(width=6, modes=6, fno_layers=2)


@pytest.mark.parametrize(
    "model",
    [
        NIOFP2D(n_basis=5, neurons=16, **SMALL),
        NIOFNO2D(**SMALL),
        NIOTrans2D(trans_layers=1, trans_hidden=8, trans_heads=2, slice_num=4, **SMALL),
        NIOTransAttn2D(trans_layers=1, trans_hidden=8, trans_heads=2, slice_num=4, **SMALL),
        NIOFNOAttn2D(**SMALL),
        NIOAttn2D(n_basis=5, neurons=16, **SMALL),
    ],
    ids=["nio", "fno", "trans", "trans_attn", "fno_attn", "attn"],
)
def test_nio2d_shapes_perm_invariance(rng, model):
    x, grid = _data(rng)
    variables = model.init(jax.random.PRNGKey(0), x, grid)
    out = model.apply(variables, x, grid)
    assert out.shape == (1, 61, 61, 2)
    perm = jnp.asarray(np.random.default_rng(1).permutation(x.shape[1]))
    out_p = model.apply(variables, x[:, perm], grid)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), rtol=2e-3, atol=1e-4)


def test_unet_shape_arithmetic():
    sizes, pads = _unet_shapes((61, 61), 4)
    assert sizes == [(61, 61), (30, 30), (15, 15), (7, 7), (3, 3)]
    # output sizes restored exactly: (c-1)*2 + 2 + pad == target
    cur = sizes[-1]
    for pad, size in zip(pads, reversed(sizes[:-1])):
        cur = tuple((c - 1) * 2 + 2 + p for c, p in zip(cur, pad))
        assert cur == size
    sizes80, _ = _unet_shapes((80,), 5)
    assert sizes80 == [(80,), (40,), (20,), (10,), (5,), (2,)]


@pytest.mark.parametrize(
    "input_size,depth,block,heads,subsample",
    [
        ((80,), 5, "convnext", (1, 1), True),  # 1D FPE bag
        ((128,), 4, "convnext", (1,), True),  # 1D GPE bag
        ((61, 61), 4, "convnext", (1, 1), True),  # 2D FPE BlinDNO
        ((61, 61), 2, "plain", (1, 1), True),  # NC-suite style (reduced depth for test)
    ],
    ids=["fpe1d", "gpe1d", "fpe2d", "nc2d"],
)
def test_unet_variants(rng, input_size, depth, block, heads, subsample):
    b, l = 1, 4
    x = jnp.asarray(rng.standard_normal((b, l) + input_size).astype(np.float32))
    model = PermInvUNetAttn(
        input_size=input_size, depth=depth, width=6, fno_modes=6, fno_layers=2,
        head_dims=heads, block=block, subsample=subsample, l_min=2,
    )
    variables = model.init({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x)
    out = model.apply(variables, x)
    assert out.shape == (b,) + input_size + (sum(heads),)
    perm = jnp.asarray(np.random.default_rng(1).permutation(l))
    out_p = model.apply(variables, x[:, perm])
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_p), rtol=2e-3, atol=1e-4)
    # train mode with subsampling runs and updates batch stats
    out_t, updates = model.apply(
        variables, x, training=True,
        rngs={"sample": jax.random.PRNGKey(2)}, mutable=["batch_stats"],
    )
    assert out_t.shape == out.shape
    assert "batch_stats" in updates
