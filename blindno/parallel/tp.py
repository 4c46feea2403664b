"""Tensor-parallel parameter sharding over the 'model' mesh axis.

The reference has no tensor parallelism (SURVEY.md §2.6); this is a TPU-native
extension: FNO spectral weights (in, out, *modes) and large Dense kernels are sharded
along their output-channel axis over 'model', and XLA inserts the all-gathers /
reduce-scatters implied by the sharded einsums. Arrays with no dimension divisible by
the axis size stay replicated.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def tp_shard_params(params, mesh: Mesh, axis: str = "model"):
    size = mesh.shape[axis]
    if size == 1:
        from blindno.parallel.mesh import replicate

        return replicate(params, mesh)

    def place(path, arr):
        spec = [None] * arr.ndim
        if arr.ndim >= 2:
            # prefer the out-channel axis (1 for spectral weights, -1 for Dense kernels)
            for cand in (1, arr.ndim - 1, 0):
                if arr.shape[cand] % size == 0 and arr.shape[cand] >= size:
                    spec[cand] = axis
                    break
        return jax.device_put(arr, NamedSharding(mesh, P(*spec)))

    return jax.tree_util.tree_map_with_path(place, params)
