"""Structured metrics logging and profiling hooks.

The reference logs via stdout prints + matplotlib PNGs (SURVEY.md §5.5); here metrics
go to JSONL (machine-readable) and optionally stdout, and ``trace`` wraps
``jax.profiler`` for TPU traces (the reference's only tracing artifact is an unused
CUDA memory debugger, ``debug_tools.py:39-103``).
"""
from __future__ import annotations

import contextlib
import json
import os
import sys
import time


class MetricsLogger:
    def __init__(self, path: str | None = None, echo: bool = True):
        self.path = path
        self.echo = echo
        if path:
            os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
            self._fh = open(path, "a")
        else:
            self._fh = None

    def log(self, record: dict):
        record = {"t": time.time(), **record}
        if self._fh:
            self._fh.write(json.dumps(record) + "\n")
            self._fh.flush()
        if self.echo:
            short = {k: (round(v, 6) if isinstance(v, float) else v) for k, v in record.items() if k != "t"}
            print(json.dumps(short), file=sys.stderr)

    def close(self):
        if self._fh:
            self._fh.close()


@contextlib.contextmanager
def trace(log_dir: str | None):
    """jax.profiler trace context; no-op when log_dir is None."""
    if not log_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
