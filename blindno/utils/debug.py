"""Memory / size debugging helpers.

Re-design of the reference's ``debug_tools.py`` (byte-identical in all four suites):
``format_tensor_size`` + a CUDA memory debugger. The TPU equivalents report device
memory via ``jax.local_devices()[0].memory_stats()`` and parameter-tree sizes.
"""
from __future__ import annotations

import jax
import numpy as np


def format_tensor_size(nbytes: float) -> str:
    """Human-readable byte count (``debug_tools.py:format_tensor_size``)."""
    for unit in ("B", "KiB", "MiB", "GiB", "TiB"):
        if abs(nbytes) < 1024.0:
            return f"{nbytes:.2f} {unit}"
        nbytes /= 1024.0
    return f"{nbytes:.2f} PiB"


def param_count(tree) -> int:
    return sum(int(np.prod(a.shape)) for a in jax.tree.leaves(tree))


def print_size(tree, name: str = "model") -> int:
    """Parameter count + bytes, mirroring the reference's ``print_size`` helpers
    (``1d_FPE/DeepONetModules.py:115-125``)."""
    n = param_count(tree)
    nbytes = sum(int(np.prod(a.shape)) * a.dtype.itemsize for a in jax.tree.leaves(tree))
    print(f"Total number of {name} parameters: {n} (~{format_tensor_size(nbytes)})")
    return n


class DeviceMemoryDebugger:
    """TPU analogue of the reference's ``CudaMemoryDebugger`` (``debug_tools.py:39-103``):
    logs current/peak device memory deltas at named checkpoints."""

    def __init__(self, print_mem: bool = True):
        self.print_mem = print_mem
        self._last = self._current()

    @staticmethod
    def _current() -> int:
        dev = jax.local_devices()[0]
        stats = dev.memory_stats() or {}
        return int(stats.get("bytes_in_use", 0))

    def print(self, label: str = ""):
        cur = self._current()
        if self.print_mem:
            delta = cur - self._last
            print(f"[mem] {label}: {format_tensor_size(cur)} (delta {format_tensor_size(delta)})")
        self._last = cur
        return cur
