"""Every registry (suite x model) config must initialize and run forward at its real
grid size — catches per-suite kernel-arithmetic config errors before long trainings."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from blindno.suites.registry import SUITES

CASES = [(s, m) for s, spec in SUITES.items() for m in spec.models]


@pytest.mark.parametrize("suite,model_name", CASES, ids=[f"{s}-{m}" for s, m in CASES])
def test_registry_model_forward(rng, suite, model_name):
    spec = SUITES[suite]
    model = spec.models[model_name]()
    grid = jnp.asarray(spec.grid)
    if grid.ndim == 2:  # 1D: (N, 1)
        n = grid.shape[0]
        x = jnp.asarray(rng.standard_normal((1, 5, n)).astype(np.float32))
        expected_grid = (n,)
    else:
        nx, ny = grid.shape[0], grid.shape[1]
        x = jnp.asarray(rng.standard_normal((1, 4, nx, ny)).astype(np.float32))
        expected_grid = (nx, ny)
    variables = jax.jit(model.init)({"params": jax.random.PRNGKey(0), "sample": jax.random.PRNGKey(1)}, x, grid)
    out = model.apply(variables, x, grid)
    n_fields = spec.loader.__call__  # targets define the field count; infer from model
    assert out.shape[0] == 1
    assert out.shape[1 : 1 + len(expected_grid)] == expected_grid
    assert out.shape[-1] in (1, 2, 3)
    assert np.isfinite(np.asarray(out)).all()
