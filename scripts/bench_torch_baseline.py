"""Measure the PyTorch reference's 2D-FPE NIO train step on THIS host (CPU torch).

Anchors bench.py's baseline (VERDICT r1 weak #5): the reference publishes no
throughput numbers, so we measure a faithful torch restatement of its benchmarked
config — NIOFP2D per ``/root/reference/2d_FPE/NIOModules.py:14-83`` +
``train_nio.py:93-100`` (Encoder2D branch ``Baselines.py:186-249``, FFN trunk,
DeepONet, frozen fc0 fusion, two FNO2d heads ``FNOModules.py:164-223``), batch 4,
L=100 snapshots, 61x61 grid, Adam + MSE — on the same CPU, and (for a like-for-like
software comparison) the JAX framework step on the same CPU.

Writes runs/logs/torch_baseline.json. The A100 anchor in bench.py is then
``torch_cpu_steps_per_sec x CPU->A100 scaling`` with the scaling documented there.
Run on CPU only — safe while the TPU is busy.
"""
import json
import os
import sys
import time

sys.path.insert(0, "/root/repo")

import numpy as np


def build_torch_step():
    import torch
    import torch.nn as nn

    class ConvBlock(nn.Module):
        def __init__(self, cin, cout, k, s, p):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, k, s, p)
            self.bn = nn.BatchNorm2d(cout)

        def forward(self, x):
            return torch.nn.functional.leaky_relu(self.bn(self.conv(x)), 0.2)

    class Encoder2D(nn.Module):
        """Baselines.py:186-249 at the 61x61 kernel schedule (final (2,1))."""

        def __init__(self, n_out):
            super().__init__()
            d = (64, 128, 256, 512, 512)
            self.blocks = nn.Sequential(
                ConvBlock(1, d[0], (1, 7), (1, 2), (0, 3)),
                ConvBlock(d[0], d[1], 3, 2, 1),
                ConvBlock(d[1], d[1], 3, 1, 1),
                ConvBlock(d[1], d[2], 3, 2, 1),
                ConvBlock(d[2], d[2], 3, 1, 1),
                ConvBlock(d[2], d[3], 3, 2, 1),
                ConvBlock(d[3], d[3], 3, 1, 1),
                ConvBlock(d[3], d[4], 3, 2, 1),
                ConvBlock(d[4], d[4], 3, 2, 1),
                ConvBlock(d[4], d[4], (2, 1), 1, 0),
            )
            self.linear = nn.Linear(d[4], n_out)

        def forward(self, x):  # (B, L, H, W)
            b, l, h, w = x.shape
            z = self.blocks(x.reshape(b * l, 1, h, w))
            return self.linear(z.reshape(b, l, -1))

    class FFN(nn.Module):
        """DeepONetModules.py:155-185 trunk: Linear+BatchNorm1d+leaky hidden stack."""

        def __init__(self, din, dout, n_hidden, neurons):
            super().__init__()
            layers = [nn.Linear(din, neurons), nn.LeakyReLU()]
            for _ in range(n_hidden - 1):
                layers += [nn.Linear(neurons, neurons), nn.BatchNorm1d(neurons), nn.LeakyReLU()]
            layers += [nn.Linear(neurons, dout)]
            self.net = nn.Sequential(*layers)

        def forward(self, x):
            return self.net(x)

    class SpectralConv2d(nn.Module):
        def __init__(self, c, m):
            super().__init__()
            scale = 1.0 / (c * c)
            self.m = m
            self.w1 = nn.Parameter(scale * torch.rand(c, c, m, m, dtype=torch.cfloat))
            self.w2 = nn.Parameter(scale * torch.rand(c, c, m, m, dtype=torch.cfloat))

        def forward(self, x):
            b, c, h, w = x.shape
            m = self.m
            xf = torch.fft.rfft2(x)
            out = torch.zeros(b, c, h, w // 2 + 1, dtype=torch.cfloat)
            out[:, :, :m, :m] = torch.einsum("bixy,ioxy->boxy", xf[:, :, :m, :m], self.w1)
            out[:, :, -m:, :m] = torch.einsum("bixy,ioxy->boxy", xf[:, :, -m:, :m], self.w2)
            return torch.fft.irfft2(out, s=(h, w))

    class FNO2d(nn.Module):
        def __init__(self, modes, width, n_layers, din):
            super().__init__()
            self.fc0 = nn.Linear(din, width)
            self.sp = nn.ModuleList(SpectralConv2d(width, modes) for _ in range(n_layers))
            self.pw = nn.ModuleList(nn.Conv2d(width, width, 1) for _ in range(n_layers))
            self.fc1 = nn.Linear(width, 128)
            self.fc2 = nn.Linear(128, 1)

        def forward(self, x):  # (B, H, W, C)
            x = self.fc0(x).permute(0, 3, 1, 2)
            h, w = x.shape[-2:]
            x = torch.nn.functional.pad(x, [0, int(round(w * 0.25)), 0, int(round(h * 0.25))])
            for k, (sp, pw) in enumerate(zip(self.sp, self.pw)):
                x = sp(x) + pw(x)
                if k != len(self.sp) - 1:
                    x = torch.nn.functional.gelu(x)
            x = x[..., :h, :w].permute(0, 2, 3, 1)
            return self.fc2(torch.nn.functional.gelu(self.fc1(x)))

    class NIOFP2D(nn.Module):
        """2d_FPE/NIOModules.py:14-83 at train_nio.py:93-100 hypers."""

        def __init__(self, width=12, modes=32, n_basis=25, neurons=100, fno_layers=3):
            super().__init__()
            self.branch = Encoder2D(n_basis)
            self.trunk = FFN(2, n_basis, 3, neurons)
            self.b0 = nn.Parameter(torch.zeros(1))
            self.fc0 = nn.Linear(3, width)
            self.fno_drift = FNO2d(modes, width, fno_layers, width)
            self.fno_diff = FNO2d(modes, width, fno_layers, width)
            self.n_basis = n_basis

        def forward(self, x, grid):  # x (B, L, H, W); grid (H*W, 2)
            b, l, h, w = x.shape
            if self.training:
                ll = np.random.randint(50, l)
                x = x[:, np.random.choice(l, ll)]
                l = ll
            br = self.branch(x)  # (B, L, p)
            tr = self.trunk(grid)  # (N, p)
            fields = torch.einsum("blp,np->bln", br, tr) / self.n_basis**0.5 + self.b0
            gridc = grid.T.unsqueeze(0).repeat(b, 1, 1)  # (B, 2, N)
            z = torch.cat([gridc, fields], dim=1).permute(0, 2, 1)  # (B, N, 2+L)
            wmat = self.fc0.weight.data
            wmat = torch.cat([wmat[:, :2], wmat[:, 2].reshape(-1, 1).repeat(1, l) / l], dim=1)
            z = torch.matmul(z, wmat.T) + self.fc0.bias.data
            z = z.reshape(b, h, w, -1)
            return torch.cat([self.fno_drift(z), self.fno_diff(z)], dim=-1)

    torch.manual_seed(0)
    model = NIOFP2D()
    opt = torch.optim.Adam(model.parameters(), lr=5e-4)
    b, l, n = 4, 100, 61
    x = torch.randn(b, l, n, n)
    y = torch.randn(b, n, n, 2)
    gx, gy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    grid = torch.tensor(np.stack([gx.ravel(), gy.ravel()], 1).astype(np.float32))
    model.train()

    def step():
        opt.zero_grad()
        out = model(x, grid)
        loss = torch.nn.functional.mse_loss(out, y)
        loss.backward()
        opt.step()
        return float(loss)

    return step


def build_jax_cpu_step():
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax

    from blindno.models.nio2d import NIOFP2D

    model = NIOFP2D(width=12, modes=32, n_basis=25, neurons=100, fno_layers=3)
    rng = np.random.default_rng(0)
    b, l, n = 4, 100, 61
    x = jnp.asarray(rng.standard_normal((b, l, n, n)).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, n, n, 2)).astype(np.float32))
    gx, gy = np.meshgrid(np.linspace(-1, 1, n), np.linspace(-1, 1, n), indexing="ij")
    grid = jnp.asarray(np.stack([gx, gy], 2).astype(np.float32))
    variables = jax.jit(model.init)(
        {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, grid)
    params = variables["params"]
    bs = variables.get("batch_stats", {})
    tx = optax.adam(5e-4)
    opt = tx.init(params)

    @jax.jit
    def train_step(params, bs, opt, k):
        def loss_fn(p):
            out, up = model.apply({"params": p, "batch_stats": bs}, x, grid, training=True,
                                  rngs={"sample": k}, mutable=["batch_stats"])
            return jnp.mean((out - y) ** 2), up["batch_stats"]

        (loss, nbs), g = jax.value_and_grad(loss_fn, has_aux=True)(params)
        u, opt2 = tx.update(g, opt, params)
        return optax.apply_updates(params, u), nbs, opt2, loss

    state = {"params": params, "bs": bs, "opt": opt, "k": jax.random.PRNGKey(2)}

    def step():
        import jax as _jax

        k1, k2 = _jax.random.split(state["k"])
        state["k"] = k1
        state["params"], state["bs"], state["opt"], loss = train_step(
            state["params"], state["bs"], state["opt"], k2)
        return float(loss)

    return step


def measure(step, warmup, iters):
    for _ in range(warmup):
        step()
    t0 = time.perf_counter()
    for _ in range(iters):
        step()
    return (time.perf_counter() - t0) / iters


def count_torch_flops(step, iters: int = 4):
    """Mean conv/matmul FLOPs of the torch train step (forward + backward), via
    torch's aten-level FlopCounterMode. The count varies per step because the
    reference subsamples L ~ U{50..99} snapshots; average a few steps under a fixed
    numpy seed. FFTs/elementwise/BN are not counted (no FLOP formula registered) —
    this is a lower bound dominated by the Encoder2D convs, which is the generous
    direction for the A100 baseline derived from it in bench.py."""
    from torch.utils.flop_counter import FlopCounterMode

    np.random.seed(123)
    counts = []
    for _ in range(iters):
        fc = FlopCounterMode(display=False)
        with fc:
            step()
        counts.append(fc.get_total_flops())
    return float(np.mean(counts))


def main():
    out = {}
    torch_step = build_torch_step()
    t_torch = measure(torch_step, warmup=2, iters=8)
    out["torch_cpu_step_s"] = round(t_torch, 4)
    out["torch_cpu_steps_per_sec"] = round(1.0 / t_torch, 4)
    out["torch_flops_per_step"] = count_torch_flops(torch_step)

    jax_step = build_jax_cpu_step()
    t_jax = measure(jax_step, warmup=3, iters=8)
    out["jax_cpu_step_s"] = round(t_jax, 4)
    out["jax_cpu_steps_per_sec"] = round(1.0 / t_jax, 4)
    out["jax_over_torch_same_host"] = round(t_torch / t_jax, 3)

    os.makedirs("/root/repo/runs/logs", exist_ok=True)
    with open("/root/repo/runs/logs/torch_baseline.json", "w") as fh:
        json.dump(out, fh, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
