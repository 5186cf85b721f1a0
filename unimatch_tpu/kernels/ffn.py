"""Fused transformer FFN Pallas kernel.

Computes the cross-attention layer's FFN tail in one pass over tokens:

    out = source + LayerNorm(W2 @ gelu(W0a @ source + W0b @ message))

i.e. the reference FFN over concat(source, message) (transformer.py:137-144)
with the first matmul split over the two channel blocks, GELU (exact erf),
the second matmul, LayerNorm, and the residual add — all while the [TM, H]
hidden activations live only in VMEM. The unfused XLA path round-trips the
hidden tensor (L x 1024 per direction) through HBM three times; at the
flagship scale-1 token count that is ~0.5 GB of traffic per cross layer.

Weights are the *same* param tensors as the jnp path (mlp_0 'kernel'
[2C, H] row-split, mlp_2 'kernel' [H, C], norm2 scale/bias), so checkpoint
conversion and the fallback path are unaffected.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _ndtr_poly(x):
    """0.5 * (1 + erf(x / sqrt(2))) via the A&S 7.1.26 polynomial (f32)."""
    z = x * jnp.float32(0.7071067811865476)  # x / sqrt(2)
    a = jnp.abs(z)
    t = 1.0 / (1.0 + jnp.float32(0.3275911) * a)
    poly = t * (
        jnp.float32(0.254829592)
        + t * (
            jnp.float32(-0.284496736)
            + t * (
                jnp.float32(1.421413741)
                + t * (jnp.float32(-1.453152027) + t * jnp.float32(1.061405429))
            )
        )
    )
    erf_abs = 1.0 - poly * jnp.exp(-a * a)
    erf = jnp.where(z >= 0, erf_abs, -erf_abs)
    return 0.5 * (1.0 + erf)


def _kernel(src_ref, msg_ref, w0a_ref, w0b_ref, w2_ref, g_ref, b_ref, o_ref, *, eps: float):
    src = src_ref[...]  # [TM, C]
    msg = msg_ref[...]

    h = jax.lax.dot_general(
        src, w0a_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    h = h + jax.lax.dot_general(
        msg, w0b_ref[...], (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    # GELU via polynomial erf (Mosaic has no erf primitive): Abramowitz &
    # Stegun 7.1.26, max abs error 1.5e-7 — far below bf16 resolution, and
    # the f32 CPU/parity paths use the jnp reference instead
    h = h * _ndtr_poly(h)

    y = jax.lax.dot_general(
        h.astype(src.dtype), w2_ref[...], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # [TM, C] f32

    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * g_ref[...].astype(jnp.float32) + b_ref[...].astype(jnp.float32)

    o_ref[...] = src + y.astype(src.dtype)


def _reference_ffn(source, message, w0, w2, gamma, beta, eps=1e-5):
    """Differentiable jnp twin (CPU path and custom-vjp backward)."""
    c = source.shape[-1]
    h = source @ w0[:c] + message @ w0[c:]
    h = jax.nn.gelu(h.astype(jnp.float32), approximate=False).astype(source.dtype)
    y = (h @ w2).astype(jnp.float32)
    mean = jnp.mean(y, axis=-1, keepdims=True)
    var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
    y = (y - mean) * jax.lax.rsqrt(var + eps)
    y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return source + y.astype(source.dtype)


@jax.custom_vjp
def _fused_ffn_vjp(source, message, w0, w2, gamma, beta):
    return _fused_ffn_impl(source, message, w0, w2, gamma, beta)


def _fused_ffn_fwd(source, message, w0, w2, gamma, beta):
    return _fused_ffn_vjp(source, message, w0, w2, gamma, beta), (
        source, message, w0, w2, gamma, beta,
    )


def _fused_ffn_bwd(res, g):
    _, vjp = jax.vjp(_reference_ffn, *res)
    return vjp(g)


_fused_ffn_vjp.defvjp(_fused_ffn_fwd, _fused_ffn_bwd)


def fused_ffn(
    source: jnp.ndarray,  # [N, L, C]
    message: jnp.ndarray,  # [N, L, C]
    w0: jnp.ndarray,  # [2C, H] (rows: source block then message block)
    w2: jnp.ndarray,  # [H, C]
    gamma: jnp.ndarray,  # [C]
    beta: jnp.ndarray,  # [C]
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    assert eps == 1e-5
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_ffn(source, message, w0, w2, gamma, beta, eps)
    if interpret:
        return _fused_ffn_impl(source, message, w0, w2, gamma, beta, interpret=True)
    return _fused_ffn_vjp(source, message, w0, w2, gamma, beta)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _fused_ffn_impl(
    source: jnp.ndarray,
    message: jnp.ndarray,
    w0: jnp.ndarray,
    w2: jnp.ndarray,
    gamma: jnp.ndarray,
    beta: jnp.ndarray,
    eps: float = 1e-5,
    interpret: bool = False,
) -> jnp.ndarray:
    n, l, c = source.shape
    hdim = w0.shape[1]
    m = n * l

    tm = 512
    mp = -(-m // tm) * tm
    src = source.reshape(m, c)
    msg = message.reshape(m, c)
    if mp != m:
        src = jnp.pad(src, ((0, mp - m), (0, 0)))
        msg = jnp.pad(msg, ((0, mp - m), (0, 0)))

    dt = source.dtype
    out = pl.pallas_call(
        functools.partial(_kernel, eps=eps),
        grid=(mp // tm,),
        in_specs=[
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((c, hdim), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((hdim, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((tm, c), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((mp, c), dt),
        interpret=interpret,
    )(
        src, msg,
        w0[:c].astype(dt), w0[c:].astype(dt), w2.astype(dt),
        gamma.reshape(1, c), beta.reshape(1, c),
    )
    return out[:m].reshape(n, l, c)
