"""Parity of PhysicsAttention (structured 2-D) against a torch re-statement of the
reference slice-attention semantics (``2d_FPE/model/Physics_Attention.py:60-116``),
with transplanted weights."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.nn.transolver import PhysicsAttention


def test_physics_attention_2d_matches_torch(rng):
    torch = pytest.importorskip("torch")
    b, h, w, c = 2, 8, 8, 16
    heads, dim_head, g = 4, 4, 6
    n = h * w
    x = rng.standard_normal((b, n, c)).astype(np.float32)

    mod = PhysicsAttention(dim=c, heads=heads, dim_head=dim_head, slice_num=g, mesh_shape=(h, w))
    variables = mod.init(jax.random.PRNGKey(0), jnp.asarray(x))
    got = np.asarray(mod.apply(variables, jnp.asarray(x)))

    p = jax.tree.map(np.asarray, variables["params"])
    tt = lambda a: torch.tensor(a)

    def conv2d(x_bchw, kernel_hwio, bias):
        # flax kernel (kh, kw, in, out) -> torch (out, in, kh, kw)
        wk = tt(np.transpose(kernel_hwio, (3, 2, 0, 1)))
        return torch.nn.functional.conv2d(x_bchw, wk, tt(bias), padding=1)

    xt = tt(x).reshape(b, h, w, c).permute(0, 3, 1, 2)  # B C H W
    fx_mid = conv2d(xt, p["TorchConv_0"]["Conv_0"]["kernel"], p["TorchConv_0"]["Conv_0"]["bias"])
    x_mid = conv2d(xt, p["TorchConv_1"]["Conv_0"]["kernel"], p["TorchConv_1"]["Conv_0"]["bias"])
    inner = heads * dim_head
    split = lambda t: t.permute(0, 2, 3, 1).reshape(b, n, heads, dim_head).permute(0, 2, 1, 3)
    fx_mid, x_mid = split(fx_mid), split(x_mid)

    temp = torch.clamp(tt(p["temperature"]), 0.1, 5.0)
    slice_logits = x_mid @ tt(p["Dense_0"]["kernel"]) + tt(p["Dense_0"]["bias"])
    slice_w = torch.softmax(slice_logits / temp, dim=-1)
    slice_norm = slice_w.sum(2)
    token = torch.einsum("bhnc,bhng->bhgc", fx_mid, slice_w) / (slice_norm[..., None] + 1e-5)

    q = token @ tt(p["Dense_1"]["kernel"])
    k = token @ tt(p["Dense_2"]["kernel"])
    v = token @ tt(p["Dense_3"]["kernel"])
    attn = torch.softmax(q @ k.transpose(-1, -2) * dim_head**-0.5, dim=-1)
    out_tok = attn @ v
    out = torch.einsum("bhgc,bhng->bhnc", out_tok, slice_w)
    out = out.permute(0, 2, 1, 3).reshape(b, n, inner)
    out = out @ tt(p["Dense_4"]["kernel"]) + tt(p["Dense_4"]["bias"])
    np.testing.assert_allclose(got, out.numpy(), rtol=2e-4, atol=2e-4)
