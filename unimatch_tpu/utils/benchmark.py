"""Reliable device timing through async/remote runtimes.

jax.block_until_ready is not trustworthy through the remote-TPU relay used in
some environments (it can return after enqueue rather than completion, or
serialize host transfers at relay bandwidth). `time_chained` instead chains
every iteration's output into a scalar accumulator and fetches only the final
scalar: the data dependency forces sequential device execution of all N
programs, and the single scalar transfer is negligible.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp


def time_chained(fn: Callable, *args, n: int = 20, warmup: int = 3,
                 min_warmup_s: float = 0.0) -> float:
    """Average seconds per call of fn(*args), forcing real device execution.

    min_warmup_s: keep executing warmup calls until this much wall time has
    elapsed since the first post-compile execution. The remote-TPU relay has
    a slow-start window of several seconds after compilation during which
    execution reads 2-5x slower than steady state; short measurements that
    sit entirely inside that window report garbage (a 12 ms model measured
    24 ms with count-based warmup only).
    """

    if not args:
        # a nullary fn jits with every input embedded as a constant, so XLA
        # constant-folds the whole computation at COMPILE time and the "runs"
        # time only dispatch (one such lambda also serialized a 1.4 GB folded
        # correlation volume into the compilation cache). Pass inputs as args.
        raise ValueError(
            "time_chained(fn) with no args measures a constant-folded no-op; "
            "pass the inputs as time_chained(fn, *args)"
        )

    def reduced(*a):
        out = fn(*a)
        leaves = jax.tree.leaves(out)
        return sum(jnp.sum(x.astype(jnp.float32)) for x in leaves)

    reduced_jit = jax.jit(reduced)
    float(reduced_jit(*args))  # compile + first execution
    t0 = time.perf_counter()
    done = 1
    while done < max(warmup, 1) or time.perf_counter() - t0 < min_warmup_s:
        float(reduced_jit(*args))
        done += 1
        if done > 10000:
            break

    t0 = time.perf_counter()
    s = jnp.zeros((), jnp.float32)
    for _ in range(n):
        s = s + reduced_jit(*args)
    float(s)
    return (time.perf_counter() - t0) / n
