"""Parity of the set ops against torch re-statements of the reference semantics."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.nn.setops import MeanFieldFusion, TemporalSelfAttention


def test_mean_field_fusion_equals_fc0_surgery(rng):
    """MeanFieldFusion == the reference's rebuilt-weight matmul
    (``1d_FPE/NIOModules.py:70-79``): W' = [W[:, :1] | W[:, 1] * 1_L / L]."""
    b, l, n, width = 2, 7, 12, 5
    fields = rng.standard_normal((b, l, n)).astype(np.float32)
    grid = rng.standard_normal((n, 1)).astype(np.float32)
    grid_b = np.broadcast_to(grid[None], (b, n, 1))

    fusion = MeanFieldFusion(width=width, grid_channels=1)
    variables = fusion.init(jax.random.PRNGKey(0), jnp.asarray(grid_b), jnp.asarray(fields))
    out = np.asarray(fusion.apply(variables, jnp.asarray(grid_b), jnp.asarray(fields)))

    w = np.asarray(variables["params"]["kernel"])  # (2, width): rows = [grid_col, snap_col]
    bias = np.asarray(variables["params"]["bias"])
    # torch-surgery restatement: weight (width, 2) -> [w0 | w1/L repeated]
    wt = w.T  # (width, 2)
    w_new = np.concatenate([wt[:, :1], np.repeat(wt[:, 1:2], l, axis=1) / l], axis=1)  # (width, 1+L)
    stack = np.concatenate([np.transpose(grid_b, (0, 2, 1)), fields], axis=1)  # (B, 1+L, N)
    want = np.einsum("bcn,wc->bnw", stack, w_new) + bias
    np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-6)


def test_temporal_self_attention_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, t, c, n = 2, 6, 3, 10
    x = rng.standard_normal((b, t, c, n)).astype(np.float32)
    mod = TemporalSelfAttention()
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    # torch re-statement (``1d_FPE/NIOModules.py:194-210``) with the same LN params
    xt = torch.tensor(x).reshape(b, t, c * n)
    scores = xt @ xt.transpose(1, 2) / np.sqrt(c * n)
    attn = torch.softmax(scores, dim=-1)
    out = attn @ xt + xt
    ln = torch.nn.LayerNorm(c * n)
    ln.weight.data = torch.tensor(np.asarray(variables["params"]["LayerNorm_0"]["scale"]))
    ln.bias.data = torch.tensor(np.asarray(variables["params"]["LayerNorm_0"]["bias"]))
    want = ln(out).detach().numpy().reshape(b, t, c, n)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_subsample_set_distribution():
    """L ~ U{l_min..L_max-1}; gathered indices uniform over the set (with replacement)."""
    from blindno.nn.setops import subsample_set

    l_max, l_min = 100, 50
    x = jnp.arange(l_max, dtype=jnp.float32).reshape(1, l_max, 1)
    ls, gathered = [], []
    for i in range(200):
        xg, mask = subsample_set(jax.random.PRNGKey(i), x, l_min, training=True)
        ls.append(int(mask.sum()))
        gathered.append(np.asarray(xg[0, :, 0]))
    ls = np.asarray(ls)
    assert ls.min() >= l_min and ls.max() <= l_max - 1
    assert abs(ls.mean() - (l_min + l_max - 1) / 2) < 3.0
    flat = np.concatenate(gathered)
    # uniform over 0..99: mean ~49.5, and duplicates must occur (with replacement)
    assert abs(flat.mean() - 49.5) < 1.5
    assert len(np.unique(gathered[0])) < l_max


def test_subsample_eval_identity():
    from blindno.nn.setops import subsample_set

    x = jnp.arange(12, dtype=jnp.float32).reshape(1, 12, 1)
    xg, mask = subsample_set(jax.random.PRNGKey(0), x, 5, training=False)
    np.testing.assert_array_equal(np.asarray(xg), np.asarray(x))
    assert float(mask.sum()) == 12
