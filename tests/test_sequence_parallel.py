"""Sequence-parallel global matching on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.ops import correlation as C
from unimatch_tpu.parallel.mesh import make_mesh
from unimatch_tpu.parallel.sequence_parallel import sp_global_correlation_softmax


def test_sp_global_correlation_matches_single(rng):
    b, h, w, c = 1, 8, 16, 32  # HW = 128 tokens, sharded 8 ways
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    ref, _ = C.global_correlation_softmax(f0, f1)

    mesh = make_mesh(jax.devices(), axis="sp")
    got = sp_global_correlation_softmax(mesh, f0, f1)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)
