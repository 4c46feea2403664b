"""Every registry (suite x model) config must trace at its real grid size — catches
per-suite kernel-arithmetic config errors (encoder conv stacks must land exactly on
80/128/61^2/80^2) before long trainings.

Default mode uses ``jax.eval_shape`` only: abstract tracing raises on any conv/reshape
arithmetic mismatch and verifies output shapes in ~1s per config, instead of ~25s of
XLA compilation each (the full suite was ~9 min). Set ``BLINDNO_FULL_REGISTRY=1`` to
additionally compile + run every config with real values (finiteness check); one
representative config per dimensionality always runs for real.
"""
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.suites.registry import SUITES

CASES = [(s, m) for s, spec in SUITES.items() for m in spec.models]
FULL = os.environ.get("BLINDNO_FULL_REGISTRY") == "1"
# always-execute representatives: smallest 1-D and one 2-D config
ALWAYS_FULL = {("fpe1d", "nio"), ("fpe2d", "unet")}


def _inputs(spec, rng):
    grid = jnp.asarray(spec.grid)
    if grid.ndim == 2:  # 1D: (N, 1)
        n = grid.shape[0]
        x = jnp.asarray(rng.standard_normal((1, 5, n)).astype(np.float32))
        return grid, x, (n,)
    nx, ny = grid.shape[0], grid.shape[1]
    x = jnp.asarray(rng.standard_normal((1, 4, nx, ny)).astype(np.float32))
    return grid, x, (nx, ny)


@pytest.mark.parametrize("suite,model_name", CASES, ids=[f"{s}-{m}" for s, m in CASES])
def test_registry_model_forward(rng, suite, model_name):
    spec = SUITES[suite]
    model = spec.models[model_name]()
    grid, x, expected_grid = _inputs(spec, rng)
    rngs = {"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}

    if FULL or (suite, model_name) in ALWAYS_FULL:
        variables = jax.jit(model.init)(rngs, x, grid)
        out = model.apply(variables, x, grid)
        assert np.isfinite(np.asarray(out)).all()
    else:
        variables = jax.eval_shape(model.init, rngs, x, grid)
        out = jax.eval_shape(model.apply, variables, x, grid)

    assert out.shape[0] == 1
    assert out.shape[1 : 1 + len(expected_grid)] == expected_grid
    assert out.shape[-1] in (1, 2, 3)
