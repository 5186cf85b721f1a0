"""Fused attention-expectation Pallas kernel.

Computes out = softmax(q @ k^T / sqrt(C)) @ v  without ever materializing the
[L, L] score matrix in HBM — scores for one query block live only in VMEM.

This single kernel covers the two O(L^2) memory hot spots of UniMatch
(BASELINE north star "fused Pallas matmul+softmax kernels that never
materialize the full cost volume"):

  * global correlation softmax (matching.py:7-36): v = pixel-coordinate grid,
    expectation gives the soft-argmax correspondence directly;
  * global self-attention flow propagation (attention.py:184-215): v = flow.

The target length L is kept resident in VMEM per query block (k: L x C bf16
~1.8 MB at Sintel 1/8 scale), so no streaming accumulators are needed; a jnp
fallback handles CPU and oversized shapes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# upper bound for the VMEM-resident [BQ, L] fp32 score block (~bytes)
_MAX_SCORE_BYTES = 12 * 1024 * 1024


def _kernel(q_ref, kt_ref, v_ref, o_ref, *, l_real: int, scale: float):
    q = q_ref[0]  # [BQ, C]
    kt = kt_ref[0]  # [C, Lp] (pre-transposed outside: natural MXU layout)
    v = v_ref[0]  # [Lp, Vp]

    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale  # [BQ, Lp] fp32

    lp = kt.shape[1]
    if lp != l_real:  # mask padded keys
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < l_real, scores, -jnp.inf)

    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = (out / s).astype(o_ref.dtype)


def _pad_to(x, size, axis):
    pad = size - x.shape[axis]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[axis] = (0, pad)
    return jnp.pad(x, widths)


def _reference(q, k, v):
    c = q.shape[-1]
    scores = jnp.einsum("blc,bmc->blm", q, k, preferred_element_type=jnp.float32) / (c**0.5)
    prob = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("blm,bmv->blv", prob, v.astype(jnp.float32))


@functools.lru_cache(maxsize=None)
def _with_vjp(block_q: int):
    """Pallas forward + jnp-reference backward (pallas_call has no autodiff)."""

    @jax.custom_vjp
    def f(q, k, v):
        return _attention_expectation_impl(q, k, v, block_q=block_q)

    def fwd(q, k, v):
        return f(q, k, v), (q, k, v)

    def bwd(res, g):
        _, vjp = jax.vjp(_reference, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def attention_expectation(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                          block_q: int = 512, interpret: bool = False) -> jnp.ndarray:
    """softmax(q k^T / sqrt(C)) v  — fused, fp32 softmax.

    q, k: [B, L, C]; v: [B, L, V] (V small). Returns [B, Lq, V] float32.
    """
    lk = k.shape[1]

    # VMEM feasibility: shrink the query block (512 -> 256 -> ... -> 64)
    # until the fp32 [BQ, Lk] score block fits the budget; only fall back to
    # plain jnp when even the smallest block does not fit. At the flagship
    # 448x1024 bench shape (scale-0 L=7168) block_q=256 fits where 512 did
    # not — the round-1 fixed-512 version silently materialized the full
    # [HW, HW] volume in HBM at exactly the shape the bench measures.
    lk_rounded = (lk + 511) // 512 * 512
    while block_q > 64 and block_q * lk_rounded * 4 > _MAX_SCORE_BYTES:
        block_q //= 2
    too_big = block_q * lk_rounded * 4 > _MAX_SCORE_BYTES
    if too_big or (jax.default_backend() == "cpu" and not interpret):
        return _reference(q, k, v)
    if interpret:
        return _attention_expectation_impl(q, k, v, block_q=block_q, interpret=True)
    return _with_vjp(block_q)(q, k, v)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def _attention_expectation_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                                block_q: int = 512, interpret: bool = False) -> jnp.ndarray:
    b, lq, c = q.shape
    lk = k.shape[1]
    vdim = v.shape[-1]
    scale = 1.0 / (c**0.5)

    lq_p = -(-lq // block_q) * block_q
    lk_p = -(-lk // 512) * 512
    v_p = max(128, -(-vdim // 128) * 128)

    qp = _pad_to(q, lq_p, 1)
    ktp = jnp.swapaxes(_pad_to(k, lk_p, 1), 1, 2)  # [B, C, Lkp]
    vp = _pad_to(_pad_to(v, lk_p, 1), v_p, 2)

    out = pl.pallas_call(
        functools.partial(_kernel, l_real=lk, scale=scale),
        grid=(b, lq_p // block_q),
        in_specs=[
            pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c, lk_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, lk_p, v_p), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, v_p), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, lq_p, v_p), jnp.float32),
        interpret=interpret,
    )(qp, ktp, vp)

    return out[:, :lq, :vdim]
