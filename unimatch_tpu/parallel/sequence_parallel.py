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


def sp_global_correlation_softmax_stereo(
    mesh: Mesh, feature0: jnp.ndarray, feature1: jnp.ndarray, axis: str = "sp"
) -> jnp.ndarray:
    """Sequence-parallel per-scanline stereo matching: disparity [B, H, W, 1].

    The stereo cost volume [B, H, W, W] (reference matching.py:126-151) is
    row-separable: row h of the volume depends only on row h of both feature
    maps, so sharding H over the mesh needs NO replication and no collectives
    beyond the output's implicit all-gather — each device builds and reduces
    its own [B, H/n, W, W] block (SURVEY §5's "natural row-block pattern").
    Same values as ops.correlation.global_correlation_softmax_stereo.
    """

    def block(f0_blk, f1_blk):
        b, h, w, c = f0_blk.shape
        corr = jnp.einsum(
            "bhic,bhjc->bhij", f0_blk, f1_blk, preferred_element_type=jnp.float32
        ) / jnp.sqrt(jnp.float32(c))
        j = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
        i = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
        corr = jnp.where((j <= i)[None, None], corr, -1e9)
        prob = jax.nn.softmax(corr, axis=-1)
        x_grid = jnp.arange(w, dtype=jnp.float32)
        correspondence = jnp.einsum("bhij,j->bhi", prob, x_grid)
        disparity = x_grid[None, None, :] - correspondence
        return disparity.astype(f0_blk.dtype)[..., None]

    fn = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
    )
    return fn(feature0, feature1)


def sp_local_correlation_with_flow(
    mesh: Mesh,
    feature0: jnp.ndarray,
    feature1: jnp.ndarray,
    flow: jnp.ndarray,
    local_radius: int,
    axis: str = "sp",
) -> jnp.ndarray:
    """Sequence-parallel flow-shifted refine correlation: [B, H, W, (2R+1)^2].

    The refine-loop window correlation (reference matching.py:86-123) is
    query-separable: each output row depends on its own row of feature0/flow
    but — because flow points anywhere — on *all* of feature1. So queries and
    flow shard over H while feature1 replicates (7 MB at flagship scale vs the
    ~0.6 GB/iteration gather, the same split as sp_attention_expectation).
    Each device runs the single-chip unique-footprint gather on its row block;
    no collectives beyond the output's implicit all-gather.
    Same values as ops.correlation.local_correlation_with_flow.
    """

    def block(f0_blk, f1_full, flow_blk):
        from unimatch_tpu.ops.correlation import local_correlation_with_flow

        row_offset = jax.lax.axis_index(axis) * f0_blk.shape[1]
        return local_correlation_with_flow(
            f0_blk, f1_full, flow_blk, local_radius,
            _sp_dispatch=False, _row_offset=row_offset,
        )

    fn = jax.shard_map(
        block,
        mesh=mesh,
        in_specs=(P(None, axis, None, None), P(None, None, None, None),
                  P(None, axis, None, None)),
        out_specs=P(None, axis, None, None),
    )
    return fn(feature0, feature1, flow)


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
