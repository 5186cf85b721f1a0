"""Profiling / tracing helpers.

The reference only offers wall-clock timing with CUDA sync (--count_time,
MODEL_ZOO.md:5). Here --count_time maps to the chained-execution timer
(utils/benchmark.py) and a structured trace is available on top: profile()
wraps any callable in jax.profiler.trace, producing a TensorBoard-viewable
xplane dump of the XLA ops and Pallas kernels.
"""

from __future__ import annotations

import contextlib
import os
from typing import Callable, Optional

import jax


@contextlib.contextmanager
def trace(log_dir: Optional[str]):
    """Context manager: JAX profiler trace when log_dir is set, no-op otherwise."""
    if not log_dir:
        yield
        return
    os.makedirs(log_dir, exist_ok=True)
    with jax.profiler.trace(log_dir):
        yield


def profile_fn(fn: Callable, *args, log_dir: str = "profile", iters: int = 3):
    """Run fn a few times under the profiler and return the last result."""
    out = fn(*args)
    jax.block_until_ready(out)  # compile outside the trace
    with trace(log_dir):
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
    return out
