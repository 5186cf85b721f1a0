"""Sequence-parallel global matching over a device mesh.

A capability the reference lacks (it is pure data-parallel — SURVEY §5): for
very large images the O((HW)^2) global correlation / propagation dominates
memory and compute on one chip. Here the *query* token dimension is sharded
over a mesh axis with shard_map: each device computes softmax-expectation for
its token block against the full target features (replicated — at UniMatch
feature sizes k/v are a few MB while the score matrix is GBs, so replicating
k/v and sharding the quadratic term is the right split). No collectives are
needed beyond the output's implicit all-gather; the per-device block runs the
same fused Pallas kernel as the single-chip path.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from unimatch_tpu.ops import geometry as G


def sp_attention_expectation(
    mesh: Mesh,
    q: jnp.ndarray,  # [B, L, C]
    k: jnp.ndarray,  # [B, L, C]
    v: jnp.ndarray,  # [B, L, V]
    axis: str = "sp",
) -> jnp.ndarray:
    """softmax(q k^T / sqrt(C)) v with the query/token dim sharded on `axis`."""

    def block(q_blk, k_full, v_full):
        from unimatch_tpu.kernels.attention_expectation import attention_expectation

        return attention_expectation(q_blk, k_full, v_full)

    fn = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(None, axis, None), P(None, None, None), P(None, None, None)),
        out_specs=P(None, axis, None),
    )
    return fn(q, k, v)


def sp_global_correlation_softmax(
    mesh: Mesh, feature0: jnp.ndarray, feature1: jnp.ndarray, axis: str = "sp"
) -> jnp.ndarray:
    """Sequence-parallel global 2D matching: flow [B, H, W, 2].

    Same semantics as ops.correlation.global_correlation_softmax (forward
    direction) with the HW token dimension sharded across the mesh.
    """
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)
    grid = G.coords_grid(h, w).reshape(h * w, 2)
    gv = jnp.broadcast_to(grid[None], (b, h * w, 2)).astype(f0.dtype)

    corresp = sp_attention_expectation(mesh, f0, f1, gv, axis=axis)
    flow = corresp.reshape(b, h, w, 2) - grid.reshape(h, w, 2)[None]
    return flow.astype(feature0.dtype)
