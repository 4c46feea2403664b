"""BlinDNO-TPU: a TPU-native JAX/Flax/Pallas framework for time-label-free PDE reconstruction.

A from-scratch re-design of the capabilities of
`yl602019618/Reconstruction-of-PDE-without-Time-Label` (the official BlinDNO research code)
as a single coherent, tested, TPU-first framework:

- ``blindno.solvers``  — L0 ground-truth PDE solvers (Fokker-Planck master equation via
  symmetric eigendecomposition / matrix exponential, split-step Fourier Schrodinger/GPE),
  replacing the reference's external ``fplanck`` dependency and in-repo numpy loops.
- ``blindno.data``     — L1 dataset generation (vmapped, on-device) and normalization.
- ``blindno.ops``      — core compute ops: spectral convolutions as truncated-DFT matmuls
  that run entirely on the TPU MXU (plus jnp.fft reference paths and Pallas kernels).
- ``blindno.nn``       — L2 neural building blocks (FNO, DeepONet, CNN encoders,
  ConvNeXt/UNet, set attention, Transolver physics attention).
- ``blindno.models``   — L3 composite set-to-field operator models (NIO family, BlinDNO).
- ``blindno.train``    — L4 jit-compiled training loops, checkpointing, schedules.
- ``blindno.eval``     — L5 field metrics, solution-space time-error rollouts, figures.
- ``blindno.parallel`` — device mesh / sharding utilities (DP over ICI; optional TP).
- ``blindno.suites``   — the four experiment suites: 1D FPE, 1D GPE/Schrodinger,
  2D FPE, 2D non-conservative FPE.
"""

__version__ = "0.1.0"
