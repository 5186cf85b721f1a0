"""Fused windowed attention Pallas kernel.

Computes out = softmax(q k^T / sqrt(C) + bias) v per window, with the
[L, L] score tile resident in VMEM — the transformer's Swin window attention
(reference attention.py:45-163) without round-tripping fp32 score tensors
through HBM. The additive SW-MSA mask is shared across batches: window w of
batch b sits at index b*nw + w, so the bias block is indexed by (i mod nw).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_SCORE_BYTES = 12 * 1024 * 1024


def _kernel(q_ref, kt_ref, v_ref, o_ref, *, scale: float, l_real: int):
    q = q_ref[0]  # [BQ, C]
    kt = kt_ref[0]  # [C, Lp]
    v = v_ref[0]  # [Lp, C]
    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kt.shape[1] != l_real:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < l_real, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        (p / s).astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_bias(q_ref, kt_ref, v_ref, b_ref, o_ref, *, scale: float, l_real: int):
    q = q_ref[0]
    kt = kt_ref[0]
    v = v_ref[0]
    bias = b_ref[0]  # [BQ, Lp] fp32
    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias
    if kt.shape[1] != l_real:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < l_real, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        (p / s).astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_rows(x, size):
    pad = size - x.shape[1]
    return x if pad == 0 else jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def _reference(q, k, v, bias=None):
    n, _, c = q.shape
    scores = jnp.einsum("nlc,nmc->nlm", q, k, preferred_element_type=jnp.float32) / (c**0.5)
    if bias is not None:
        nw = bias.shape[0]
        scores = scores + jnp.tile(bias, (n // nw, 1, 1))
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nlm,nmc->nlc", p.astype(v.dtype), v)


@functools.lru_cache(maxsize=None)
def _with_vjp(has_bias: bool):
    """Pallas forward + jnp-reference backward (pallas_call has no autodiff)."""
    if has_bias:

        @jax.custom_vjp
        def f(q, k, v, bias):
            return _window_attention_impl(q, k, v, bias)

        def fwd(q, k, v, bias):
            return f(q, k, v, bias), (q, k, v, bias)

        def bwd(res, g):
            _, vjp = jax.vjp(_reference, *res)
            return vjp(g)

    else:

        @jax.custom_vjp
        def f(q, k, v):
            return _window_attention_impl(q, k, v, None)

        def fwd(q, k, v):
            return f(q, k, v), (q, k, v)

        def bwd(res, g):
            _, vjp = jax.vjp(lambda a, b, c_: _reference(a, b, c_), *res)
            return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Per-window attention. q,k,v: [N, L, C]; bias: [nw, L, L] fp32 with
    nw | N (window w of batch b at index b*nw + w). Returns [N, L, C]."""
    l = q.shape[1]
    block_q = min(512, -(-l // 128) * 128)
    lp = -(-l // 128) * 128

    if block_q * lp * 4 > _MAX_SCORE_BYTES or (jax.default_backend() == "cpu" and not interpret):
        return _reference(q, k, v, bias)
    if interpret:
        return _window_attention_impl(q, k, v, bias, interpret=True)
    if bias is None:
        return _with_vjp(False)(q, k, v)
    return _with_vjp(True)(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _window_attention_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    n, l, c = q.shape
    scale = 1.0 / (c**0.5)
    block_q = min(512, -(-l // 128) * 128)
    lp = -(-l // 128) * 128
    lqp = -(-l // block_q) * block_q

    qp = _pad_rows(q, lqp)
    ktp = jnp.swapaxes(_pad_rows(k, lp), 1, 2)
    vp = _pad_rows(v, lp)

    grid = (n, lqp // block_q)
    common_specs = [
        pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, lp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, lqp, c), q.dtype)

    if bias is None:
        out = pl.pallas_call(
            functools.partial(_kernel, scale=scale, l_real=l),
            grid=grid, in_specs=common_specs, out_specs=out_spec, out_shape=out_shape,
            interpret=interpret,
        )(qp, ktp, vp)
    else:
        nw = bias.shape[0]
        bp = jnp.pad(
            bias.astype(jnp.float32), ((0, 0), (0, lqp - l), (0, lp - l))
        )
        bias_spec = pl.BlockSpec(
            (1, block_q, lp), lambda i, j: (i % nw, j, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_kernel_bias, scale=scale, l_real=l),
            grid=grid, in_specs=common_specs + [bias_spec], out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(qp, ktp, vp, bp)

    return out[:, :l]
