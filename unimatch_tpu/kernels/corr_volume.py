"""Pallas kernels for the tiled refine-correlation volume path.

The regression-refinement loop's flow-shifted window correlation (reference
unimatch/matching.py:86-123) re-gathers ~0.6 GB of feature rows per iteration
at the flagship bench shape — transaction-limited at the ~43 GB/s HBM gather
ceiling, >60% of the flagship forward over 6 iterations (docs/PERF_NOTES.md).
Since feature0/feature1 are fixed across all refine iterations, precomputing
the all-pairs correlations once amortizes that traffic: the volume is stored
in a 16x16-unit tiled layout (one contiguous 512 B unit per 16x16 block of
target positions), so each iteration's lookup is 4 unit-gathers per pixel
(~2 KB) instead of ~40 KB of feature rows.

Round 2 measured this same design SLOWER in pure XLA for two reasons, both of
which these kernels remove:
  * the volume-build matmul ([HW, C] x [C, M] with pre-blocked feature1) ran
    at ~27 GB/s effective output bandwidth under XLA (~85 ms at bench shape);
    the Pallas build kernel streams output tiles at the HBM write bound;
  * the lookup's 2x16 branchless shift-selects materialized [HW, 10, 32]
    intermediates through HBM under XLA (~25 ms/iteration); in the Pallas
    lookup kernel the span assembly, selects, and bilinear blend all stay in
    VMEM.

The unit gather itself (pixel-local indices into the pixel's own volume slab)
stays in XLA `jnp.take` — per-element gathers are the one thing XLA does
better than a Pallas scalar loop on this part (kernels/corr_window.py is the
measured negative result).

Both kernels carry the custom_vjp pattern (Pallas forward, jnp-twin backward)
because pallas_call has no autodiff; the training path in the model assembly
uses the direct gather formulation anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 16  # unit side: 16x16 taps = 256 elements = 512 B in bf16


def _pad_rows(x: jnp.ndarray, size: int) -> jnp.ndarray:
    pad = size - x.shape[1]
    if pad == 0:
        return x
    widths = [(0, 0)] * x.ndim
    widths[1] = (0, pad)
    return jnp.pad(x, widths)


def _pick_m_block(m: int, target: int = 2048, cap: int = 4096) -> int:
    """Largest multiple-of-256 divisor of m that is <= cap, preferring ~target."""
    units = m // TILE**2
    best = 1
    for u in range(1, units + 1):
        if units % u == 0 and u * TILE**2 <= cap:
            best = u
    return best * TILE**2


# ---------------------------------------------------------------------------
# volume build: vt[b, p, m] = <f0[b, p, :], f1b[b, m, :]>  (f32 acc -> bf16)
# ---------------------------------------------------------------------------


def _build_kernel(f0_ref, f1b_ref, o_ref):
    o_ref[0] = jax.lax.dot_general(
        f0_ref[0], f1b_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("out_dtype", "block_p", "interpret"))
def _build_volume_impl(f0, f1b, out_dtype=jnp.bfloat16, block_p=512, interpret=False):
    b, p, c = f0.shape
    m = f1b.shape[1]
    bm = _pick_m_block(m)
    pp = -(-p // block_p) * block_p
    f0p = _pad_rows(f0, pp)
    return pl.pallas_call(
        _build_kernel,
        grid=(b, pp // block_p, m // bm),
        in_specs=[
            pl.BlockSpec((1, block_p, c), lambda i, j, k: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, c), lambda i, j, k: (i, k, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_p, bm), lambda i, j, k: (i, j, k), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, pp, m), out_dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * m * c,
            bytes_accessed=b * (pp * c + m * c + pp * m) * 2,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f0p, f1b)


def _build_reference(f0, f1b, out_dtype):
    return jnp.einsum("bpc,bmc->bpm", f0, f1b, preferred_element_type=out_dtype)


@functools.lru_cache(maxsize=None)
def _build_with_vjp(out_dtype, block_p):
    @jax.custom_vjp
    def f(f0, f1b):
        return _build_volume_impl(f0, f1b, out_dtype=out_dtype, block_p=block_p)

    def fwd(f0, f1b):
        return f(f0, f1b), (f0, f1b)

    def bwd(res, g):
        f0, f1b = res
        p = f0.shape[1]
        _, vjp = jax.vjp(lambda a, b: _build_reference(a, b, out_dtype), f0, f1b)
        return vjp(g[:, :p].astype(out_dtype))

    f.defvjp(fwd, bwd)
    return f


def build_volume(f0: jnp.ndarray, f1b: jnp.ndarray, out_dtype=jnp.bfloat16,
                 block_p: int = 512, interpret: bool = False) -> jnp.ndarray:
    """All-pairs correlation volume, unscaled: [B, Ppad, M] in out_dtype.

    f0: [B, P, C] query features; f1b: [B, M, C] pre-blocked (tiled-unit
    layout) target features. Rows >= P of the output are padding garbage —
    callers index p < P only. Values match the jnp einsum with
    preferred_element_type=out_dtype (single f32->out_dtype rounding).
    """
    if interpret:
        return _build_volume_impl(f0, f1b, out_dtype=out_dtype, block_p=block_p,
                                  interpret=True)
    if jax.default_backend() == "cpu":
        return _build_reference(f0, f1b, out_dtype)
    return _build_with_vjp(out_dtype, block_p)(f0, f1b)


# ---------------------------------------------------------------------------
# lookup: gathered 2x2 units -> span assembly -> rem shift-select -> bilinear
# ---------------------------------------------------------------------------


def _lookup_kernel(g_ref, sc_ref, o_ref, *, k: int, scale: float):
    kk = k + 1
    t = TILE
    dt = o_ref.dtype
    g = g_ref[...]  # [BP, 4, t*t] units in (r, g) row-major order
    bp = g.shape[0]

    # span assembly: unit (i, j) holds rows t*i.., cols t*j.. -> [BP, 2t, 2t]
    span = (
        g.reshape(bp, 2, 2, t, t).transpose(0, 1, 3, 2, 4).reshape(bp, 2 * t, 2 * t)
    ).astype(dt)

    sc = sc_ref[...]  # [BP, 4] f32: remy, remx, wx1, wy1
    remy = sc[:, 0:1]
    remx = sc[:, 1:2]
    zero = jnp.zeros((), dt)

    # branchless rem selection (rows then cols) — entirely VMEM-resident
    cpr = None
    for a in range(t):
        term = jnp.where((remy == a)[:, :, None], span[:, a : a + kk, :], zero)
        cpr = term if cpr is None else cpr + term  # [BP, kk, 2t]
    cp = None
    for bcol in range(t):
        term = jnp.where((remx == bcol)[:, :, None], cpr[:, :, bcol : bcol + kk], zero)
        cp = term if cp is None else cp + term  # [BP, kk, kk]

    wx1 = sc[:, 2:3].astype(dt)[:, :, None]
    wy1 = sc[:, 3:4].astype(dt)[:, :, None]
    one = jnp.ones((), dt)
    c00 = cp[:, 0:k, 0:k]
    c01 = cp[:, 0:k, 1 : k + 1]
    c10 = cp[:, 1 : k + 1, 0:k]
    c11 = cp[:, 1 : k + 1, 1 : k + 1]
    corr = (
        c00 * (one - wy1) * (one - wx1)
        + c01 * (one - wy1) * wx1
        + c10 * wy1 * (one - wx1)
        + c11 * wy1 * wx1
    )
    o_ref[...] = (corr * jnp.asarray(scale, dt)).reshape(bp, k * k)


@functools.partial(jax.jit, static_argnames=("k", "scale", "out_dtype", "block_p", "interpret"))
def _lookup_impl(g, sc, k, scale, out_dtype, block_p=256, interpret=False):
    n = g.shape[0]
    npad = -(-n // block_p) * block_p
    if npad != n:
        g = jnp.pad(g, ((0, npad - n), (0, 0), (0, 0)))
        sc = jnp.pad(sc, ((0, npad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, k=k, scale=scale),
        grid=(npad // block_p,),
        in_specs=[
            pl.BlockSpec((block_p, 4, TILE**2), lambda i: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, 4), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_p, k * k), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, k * k), out_dtype),
        interpret=interpret,
    )(g, sc)
    return out[:n]


def _lookup_reference(g, sc, k, scale, out_dtype):
    """jnp twin of _lookup_kernel (bit-identical given the same inputs)."""
    kk = k + 1
    t = TILE
    n = g.shape[0]
    span = (
        g.reshape(n, 2, 2, t, t).transpose(0, 1, 3, 2, 4).reshape(n, 2 * t, 2 * t)
    ).astype(out_dtype)
    remy = sc[:, 0:1]
    remx = sc[:, 1:2]
    zero = jnp.zeros((), out_dtype)
    cpr = sum(
        jnp.where((remy == a)[:, :, None], span[:, a : a + kk, :], zero) for a in range(t)
    )
    cp = sum(
        jnp.where((remx == b)[:, :, None], cpr[:, :, b : b + kk], zero) for b in range(t)
    )
    wx1 = sc[:, 2:3].astype(out_dtype)[:, :, None]
    wy1 = sc[:, 3:4].astype(out_dtype)[:, :, None]
    one = jnp.ones((), out_dtype)
    c00 = cp[:, 0:k, 0:k]
    c01 = cp[:, 0:k, 1 : k + 1]
    c10 = cp[:, 1 : k + 1, 0:k]
    c11 = cp[:, 1 : k + 1, 1 : k + 1]
    corr = (
        c00 * (one - wy1) * (one - wx1)
        + c01 * (one - wy1) * wx1
        + c10 * wy1 * (one - wx1)
        + c11 * wy1 * wx1
    )
    return (corr * jnp.asarray(scale, out_dtype)).reshape(n, k * k)


@functools.lru_cache(maxsize=None)
def _lookup_with_vjp(k, scale, out_dtype, block_p):
    @jax.custom_vjp
    def f(g, sc):
        return _lookup_impl(g, sc, k, scale, out_dtype, block_p=block_p)

    def fwd(g, sc):
        return f(g, sc), (g, sc)

    def bwd(res, ct):
        g, sc = res
        _, vjp = jax.vjp(lambda a, b: _lookup_reference(a, b, k, scale, out_dtype), g, sc)
        return vjp(ct)

    f.defvjp(fwd, bwd)
    return f


def lookup_select_blend(g: jnp.ndarray, sc: jnp.ndarray, k: int, scale: float,
                        out_dtype, block_p: int = 256,
                        interpret: bool = False) -> jnp.ndarray:
    """Select + bilinear-blend gathered 2x2 volume units.

    g: [N, 4, 256] units for N pixels (row-major (r, g) order);
    sc: [N, 4] f32 packed per-pixel scalars (remy, remx, wx1, wy1).
    Returns [N, k*k] window correlations in out_dtype (scale applied).
    """
    if interpret:
        return _lookup_impl(g, sc, k, scale, out_dtype, block_p=block_p, interpret=True)
    if jax.default_backend() == "cpu":
        return _lookup_reference(g, sc, k, scale, out_dtype)
    return _lookup_with_vjp(k, scale, jnp.dtype(out_dtype), block_p)(g, sc)
