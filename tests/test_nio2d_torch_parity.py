"""End-to-end golden parity for the 2-D NIO composite (VERDICT r3 next-step #3).

The flax ``NIOFP2D`` with transplanted weights must match a torch re-statement of the
reference model semantics (``2d_FPE/NIOModules.py:14-83``: Encoder2D branch
``2d_FPE/Baselines.py:186-249``, FFN trunk + DeepOnetNoBiasOrg
``2d_FPE/DeepONetModules.py:128-185``, the fc0 weight-surgery mean-field fusion, and the
dual FNO2d heads ``2d_FPE/FNOModules.py:124-245``) to float tolerance, in eval mode with
RANDOMIZED BatchNorm statistics/affine parameters (so every BN actually transforms).

This closes the "is the 2-D path itself wrong?" branch of the fpe2d accuracy
investigation: any layout/padding/normalization translation bug anywhere in the
encoder -> deeponet -> fusion -> spectral-head chain fails this test.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blindno.models.nio2d import NIOFP2D

WIDTH, MODES, N_BASIS, NEURONS, FNO_LAYERS = 6, 8, 7, 16, 2
NX = 61  # Encoder2D's conv schedule collapses exactly 61x61 (final kernel (2,1))


def _randomize_bn(variables, rng):
    """Give every BatchNorm non-trivial running stats and affine params, so the eval
    pass exercises the normalization (at init flax/torch BN are both identity)."""

    def visit(path, leaf):
        names = [getattr(p, "key", "") for p in path]
        if "BatchNorm_0" not in names:
            return leaf
        kind = names[-1]
        if kind == "scale":
            return jnp.asarray(rng.uniform(0.6, 1.4, leaf.shape), leaf.dtype)
        if kind == "bias":
            return jnp.asarray(rng.normal(0.0, 0.08, leaf.shape), leaf.dtype)
        if kind == "mean":
            return jnp.asarray(rng.normal(0.0, 0.05, leaf.shape), leaf.dtype)
        if kind == "var":
            return jnp.asarray(rng.uniform(0.7, 1.3, leaf.shape), leaf.dtype)
        return leaf

    return jax.tree_util.tree_map_with_path(visit, variables)


# ------------------------------------------------------------------ torch restatement


def _bn(F, x, p, s):
    bn, st = p["BatchNorm_0"], s["BatchNorm_0"]
    t = lambda a: __import__("torch").tensor(np.asarray(a))
    return F.batch_norm(x, t(st["mean"]), t(st["var"]), t(bn["scale"]), t(bn["bias"]),
                        training=False, eps=1e-5)


def _conv_block(torch, x, p, s, stride, padding, slope=0.2):
    """ConvBlock = Conv2d + BN2d + LeakyReLU(0.2) (``2d_FPE/Baselines.py:40-52``)."""
    F = torch.nn.functional
    t = lambda a: torch.tensor(np.asarray(a))
    c = p["TorchConv_0"]["Conv_0"]
    w = t(c["kernel"]).permute(3, 2, 0, 1)  # flax (kh,kw,cin,cout) -> torch (cout,cin,kh,kw)
    x = F.conv2d(x, w, t(c["bias"]), stride=stride, padding=padding)
    x = _bn(F, x, p["TorchBatchNorm_0"], s["TorchBatchNorm_0"])
    return F.leaky_relu(x, slope)


# (stride, padding) per ConvBlock of the reference Encoder2D schedule
_ENC_SCHEDULE = [
    ((1, 2), (0, 3)),  # (1,7) kernel
    ((2, 2), (1, 1)), ((1, 1), (1, 1)),
    ((2, 2), (1, 1)), ((1, 1), (1, 1)),
    ((2, 2), (1, 1)), ((1, 1), (1, 1)),
    ((2, 2), (1, 1)), ((2, 2), (1, 1)),
    ((1, 1), (0, 0)),  # final (2,1) kernel, collapses to 1x1
]


def _encoder2d(torch, x, p, s):
    """``2d_FPE/Baselines.py:186-249``: x (B, L, nx, ny) -> (B, L, n_basis)."""
    b, l, nx, ny = x.shape
    h = x.reshape(b * l, 1, nx, ny)
    for k, (stride, pad) in enumerate(_ENC_SCHEDULE):
        h = _conv_block(torch, h, p[f"ConvBlock_{k}"], s[f"ConvBlock_{k}"], stride, pad)
    h = h.reshape(b, l, -1)
    t = lambda a: torch.tensor(np.asarray(a))
    d = p["TorchDense_0"]["Dense_0"]
    return h @ t(d["kernel"]) + t(d["bias"])


def _ffn(torch, x, p, s, n_hidden_layers):
    """FFN trunk (``2d_FPE/DeepONetModules.py:155-185``), leaky_relu(0.01), eval BN."""
    F = torch.nn.functional
    t = lambda a: torch.tensor(np.asarray(a))
    dense = lambda h, name: h @ t(p[name]["kernel"]) + t(p[name]["bias"])
    x = F.leaky_relu(dense(x, "Dense_0"), 0.01)
    for k in range(1, n_hidden_layers):
        h = F.leaky_relu(dense(x, f"Dense_{k}"), 0.01)
        x = _bn(F, h, p[f"TorchBatchNorm_{k-1}"], s[f"TorchBatchNorm_{k-1}"])
    return dense(x, f"Dense_{n_hidden_layers}")


def _spectral2d(torch, x, wr, wi):
    """``2d_FPE/FNOModules.py:124-180``: rfft2, +/- row blocks, irfft2. Flax packs
    weights1/weights2 as rows [:m1] / [m1:] of a (cin, cout, 2*m1, m2) array."""
    h, w_len = x.shape[-2], x.shape[-1]
    t = lambda a: torch.tensor(np.asarray(a))
    w = torch.complex(t(wr), t(wi))
    xf = torch.fft.rfft2(x)
    out = torch.zeros(x.shape[0], w.shape[1], h, w_len // 2 + 1, dtype=torch.cfloat)
    mul = lambda a, b: torch.einsum("bixy,ioxy->boxy", a, b)
    m1, m2 = wr.shape[2] // 2, wr.shape[3]
    out[:, :, :m1, :m2] = mul(xf[:, :, :m1, :m2], w[:, :, :m1])
    out[:, :, -m1:, :m2] = mul(xf[:, :, -m1:, :m2], w[:, :, m1:])
    return torch.fft.irfft2(out, s=(h, w_len))


def _fno2d(torch, x, p, n_layers):
    """``2d_FPE/FNOModules.py:183-245``: lift, 1/4 right/bottom pad, spectral+1x1, proj."""
    F = torch.nn.functional
    t = lambda a: torch.tensor(np.asarray(a))
    dense = lambda h, name: (h @ t(p[name]["Dense_0"]["kernel"])
                             + t(p[name]["Dense_0"]["bias"]))
    x = dense(x, "TorchDense_0")  # fc0
    x = x.permute(0, 3, 1, 2)
    h, w_len = x.shape[-2], x.shape[-1]
    pad_w = int(round(w_len * 0.25))
    pad_h = int(round(h * 0.25))
    x = F.pad(x, [0, pad_w, 0, pad_h])
    for k in range(n_layers):
        sp = p[f"SpectralConv2d_{k}"]
        x1 = _spectral2d(torch, x, sp["weights_re"], sp["weights_im"])
        pw = p[f"PointwiseConv_{k}"]
        x2 = torch.einsum("bchw,co->bohw", x, t(pw["kernel"])) + t(pw["bias"]).reshape(1, -1, 1, 1)
        x = x1 + x2
        if k != n_layers - 1:
            x = F.gelu(x)
    x = x[..., :h, :w_len]
    x = x.permute(0, 2, 3, 1)
    x = F.gelu(dense(x, "TorchDense_1"))
    return dense(x, "TorchDense_2")


def _torch_niofp2d(params, stats, x_np, grid_np):
    """Reference NIOFP2D forward (``2d_FPE/NIOModules.py:46-82``), eval mode."""
    torch = pytest.importorskip("torch")
    t = lambda a: torch.tensor(np.asarray(a))
    x, grid = t(x_np), t(grid_np)
    b, l, nx, ny = x.shape

    dp = params["DeepOnetNoBias_0"]
    weights = _encoder2d(torch, x, params["Encoder2D_0"], stats["Encoder2D_0"])
    basis = _ffn(torch, grid.reshape(-1, 2), params["FFN_0"], stats["FFN_0"], 3)
    p = basis.shape[-1]
    fields = (torch.matmul(weights, basis.T) + t(dp["b0"])) / p ** 0.5  # (B, L, nx*ny)
    fields = fields.reshape(b, l, nx, ny)

    grid_t = grid.unsqueeze(0).repeat(b, 1, 1, 1).permute(0, 3, 1, 2)  # (B, 2, nx, ny)
    tokens = torch.cat((grid_t, fields), 1)  # (B, 2+L, nx, ny)
    # fc0 weight surgery: W (width, 3) -> [W[:, :2] | W[:, 2]/L * ones(L)]
    w_fused = t(params["MeanFieldFusion_0"]["kernel"]).T  # (width, 3)
    w_trans = torch.cat([w_fused[:, :2], w_fused[:, 2:3].repeat(1, l) / l], dim=1)
    fused = tokens.permute(0, 2, 3, 1) @ w_trans.T + t(params["MeanFieldFusion_0"]["bias"])

    drift = _fno2d(torch, fused, params["FNO2d_0"], FNO_LAYERS)
    diffusion = _fno2d(torch, fused, params["FNO2d_1"], FNO_LAYERS)
    return torch.cat((drift, diffusion), dim=-1).numpy()


def test_niofp2d_matches_torch_restatement(rng):
    model = NIOFP2D(width=WIDTH, modes=MODES, n_basis=N_BASIS, neurons=NEURONS,
                    fno_layers=FNO_LAYERS)
    x = rng.standard_normal((2, 3, NX, NX)).astype(np.float32)
    xs, ys = np.meshgrid(np.linspace(0, 1, NX), np.linspace(0, 1, NX), indexing="ij")
    grid = np.stack([xs, ys], axis=-1).astype(np.float32)

    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x), jnp.asarray(grid),
                           training=False)
    variables = _randomize_bn(variables, np.random.default_rng(7))
    got = np.asarray(model.apply(variables, jnp.asarray(x), jnp.asarray(grid),
                                 training=False))

    params = jax.tree.map(np.asarray, variables["params"])
    stats = jax.tree.map(np.asarray, variables["batch_stats"])
    want = _torch_niofp2d(params, stats, x, grid)

    assert got.shape == want.shape == (2, NX, NX, 2)
    # outputs must be non-degenerate for the comparison to mean anything
    assert np.std(want) > 1e-3
    np.testing.assert_allclose(got, want, rtol=2e-3, atol=2e-3)
