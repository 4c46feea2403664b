"""Device mesh and sharding utilities.

The reference's only parallelism is data-parallel DDP via HuggingFace Accelerate/NCCL
(``2d_FPE/train_nio.py:75-77,119-121,141``; SURVEY.md §2.6). TPU-native equivalent:
a ``Mesh`` over all devices with batch-dim ``NamedSharding`` — jit then emits the
gradient all-reduce over ICI automatically. The same program runs on one chip (mesh of
1) or N; no wrapper classes, no process groups.

An optional 2-D ``(data, model)`` mesh supports channel sharding of the FNO spectral
weights (tensor parallelism the reference does not have).
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(devices=None, batch_size: int | None = None) -> Mesh:
    """1-D data mesh. If ``batch_size`` is given, use the largest device count that
    divides it (so per-step batches shard evenly; a mesh of 1 is always valid)."""
    devices = list(devices if devices is not None else jax.devices())
    if batch_size is not None:
        n = len(devices)
        while n > 1 and batch_size % n != 0:
            n -= 1
        devices = devices[:n]
    return Mesh(np.asarray(devices), axis_names=("data",))


def data_model_mesh(n_model: int = 1, devices=None) -> Mesh:
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    assert n % n_model == 0, f"{n} devices not divisible by model axis {n_model}"
    return Mesh(devices.reshape(n // n_model, n_model), axis_names=("data", "model"))


def shard_batch(x, mesh: Mesh):
    """Shard the leading (batch/sample) axis over the 'data' mesh axis."""
    spec = P("data", *([None] * (x.ndim - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(tree, mesh: Mesh):
    """Fully replicate a pytree (params, optimizer state) over the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda a: jax.device_put(a, sharding), tree)


def is_main_process() -> bool:
    """Main-host gating for logging/ckpt (reference: ``accelerator.is_local_main_process``)."""
    return jax.process_index() == 0
