"""Pallas TPU kernels for the hot matching/attention paths.

Each kernel has a pure-jnp reference twin in unimatch_tpu.ops used for
correctness tests and as the CPU fallback. Dispatch: `use_pallas()` is true
on TPU backends unless UNIMATCH_DISABLE_PALLAS=1.
"""

import os

import jax


def use_pallas() -> bool:
    if os.environ.get("UNIMATCH_DISABLE_PALLAS", "0") == "1":
        return False
    return jax.default_backend() == "tpu"
