"""Golden parity: the flax FNO1d with transplanted weights must match a torch
re-statement of the reference network semantics (``1d_FPE/FNOModules.py:62-122``)
to float tolerance. Catches layout/padding/activation translation bugs end-to-end.
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from blindno.nn.fno import FNO1d


def _torch_fno1d(params, x_np, modes, width, n_layers, input_dim, output_dim):
    torch = pytest.importorskip("torch")
    tt = lambda a: torch.tensor(np.asarray(a))

    x = tt(x_np)
    # fc0 lift: flax Dense kernel (in, out) == torch weight.T
    x = x @ tt(params["TorchDense_0"]["Dense_0"]["kernel"]) + tt(params["TorchDense_0"]["Dense_0"]["bias"])
    x = x.permute(0, 2, 1)
    n = x.shape[-1]
    pad = int(round(n * 0.25))
    x = torch.nn.functional.pad(x, [0, pad])
    for k in range(n_layers):
        sp = params[f"SpectralConv1d_{k}"]
        w = torch.complex(tt(sp["weights_re"]), tt(sp["weights_im"]))
        xf = torch.fft.rfft(x)
        xf[:, :, 0] = 0.5 * xf[:, :, 0]
        out = torch.zeros(x.shape[0], width, x.shape[-1] // 2 + 1, dtype=torch.cfloat)
        out[:, :, :modes] = torch.einsum("bix,iox->box", xf[:, :, :modes], w)
        x1 = torch.fft.irfft(out, n=x.shape[-1])
        pw = params[f"PointwiseConv_{k}"]
        x2 = torch.einsum("bcn,co->bon", x, tt(pw["kernel"])) + tt(pw["bias"]).reshape(1, -1, 1)
        x = x1 + x2
        if k != n_layers - 1:
            x = torch.nn.functional.gelu(x)
    x = x[..., :n]
    x = x.permute(0, 2, 1)
    x = x @ tt(params["TorchDense_1"]["Dense_0"]["kernel"]) + tt(params["TorchDense_1"]["Dense_0"]["bias"])
    x = torch.nn.functional.gelu(x)
    x = x @ tt(params["TorchDense_2"]["Dense_0"]["kernel"]) + tt(params["TorchDense_2"]["Dense_0"]["bias"])
    return x.numpy()


def test_fno1d_matches_torch_restatement(rng):
    modes, width, n_layers, input_dim, output_dim = 12, 10, 3, 4, 2
    model = FNO1d(modes, width, n_layers, input_dim, output_dim)
    x = rng.standard_normal((3, 80, input_dim)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(model.apply(variables, jnp.asarray(x)))
    want = _torch_fno1d(
        jax.tree.map(np.asarray, variables["params"]), x, modes, width, n_layers, input_dim, output_dim
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
