"""Test configuration: force an 8-device virtual CPU mesh for all tests.

The reference code has no test suite at all (SURVEY.md §4); this framework tests every
kernel/solver/model, and multi-device (DP/TP) paths run on a fake 8-device CPU mesh —
the standard `xla_force_host_platform_device_count` trick.

Note: this environment's sitecustomize pre-imports JAX with a TPU ('axon') platform, so
the usual JAX_PLATFORMS env var is too late — we switch the platform through jax.config
(the backend is not yet initialized at conftest time) and set the host device count flag
before the first computation.
"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402
import pytest  # noqa: E402


@pytest.fixture
def rng():
    return np.random.default_rng(0)


@pytest.fixture
def x64():
    """Temporarily enable float64 (used by long-horizon solver physics tests)."""
    jax.config.update("jax_enable_x64", True)
    yield
    jax.config.update("jax_enable_x64", False)
