"""Per-sample augmentation RNG (thread-local).

The reference seeds every torch DataLoader worker from (base_seed + worker_id)
(dataloader/flow/datasets.py:61-67) so augmentation streams are reproducible.
Our loader uses threads, which share the global numpy RNG — instead, each
sample is augmented under a thread-local RandomState derived from
(seed, epoch, index), which is *stronger* than the reference's per-worker
seeding: the augmentation of sample i at epoch e is identical regardless of
worker count, scheduling, or sharding.

Augmentors fetch the stream via get_rng(); outside a seeded scope (e.g. eval
or direct dataset indexing) it falls back to the global numpy RNG, preserving
the old behavior.
"""

from __future__ import annotations

import contextlib
import threading

import numpy as np

_tls = threading.local()


def get_rng():
    """Thread-local RandomState if a sample scope is active, else np.random.

    Both expose the same legacy API (rand, randint, uniform, permutation, ...).
    """
    rng = getattr(_tls, "rng", None)
    return rng if rng is not None else np.random


def derive_rng(seed: int, epoch: int, index: int) -> np.random.RandomState:
    """Deterministic, well-mixed per-sample stream."""
    ss = np.random.SeedSequence([int(seed), int(epoch), int(index)])
    return np.random.RandomState(ss.generate_state(4))


@contextlib.contextmanager
def sample_rng_scope(seed: int, epoch: int, index: int):
    prev = getattr(_tls, "rng", None)
    _tls.rng = derive_rng(seed, epoch, index)
    try:
        yield _tls.rng
    finally:
        _tls.rng = prev
