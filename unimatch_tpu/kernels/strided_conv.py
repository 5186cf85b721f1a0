"""Fused strided-convolution Pallas kernel (space-to-depth cell form).

conv_via_matmul's stride-s branch (models/layers.py) lowers a k x k
stride-s convolution to na*nb cell matmuls over the space-to-depth input —
MXU-friendly, but each cell's f32 [N, cout] partial round-trips HBM: the
7x7/s2 stem at the flagship shape writes+reads ~470 MB of partials for a
14.7 MB result, and the 3x3/s2 stage downsamples add ~90 MB each.

This kernel keeps the accumulator in VMEM: per row band it loads the s2d
input once and runs all cells' dots back to back. The cell weight layout
is built by the same code the XLA path uses (models/layers.py cell
grouping), so values match the shifted-matmul form up to f32 summation
order. Backward runs the jnp twin's vjp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(x_ref, w_ref, o_ref, *, na: int, nb: int, t: int, w: int):
    band = x_ref[0, 0]  # [T+na-1, Wpad, Cs2d]
    cs2d = band.shape[-1]
    cout = o_ref.shape[-1]
    acc = jnp.zeros((t * w, cout), jnp.float32)
    for a in range(na):
        for b in range(nb):
            sl = band[a : a + t, b : b + w, :].reshape(t * w, cs2d)
            acc = acc + jax.lax.dot_general(
                sl, w_ref[a * nb + b], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
    o_ref[0] = acc.astype(o_ref.dtype).reshape(t, w, cout)


@functools.partial(jax.jit, static_argnames=("na", "nb", "oh", "ow", "out_dtype", "t", "interpret"))
def _strided_conv_impl(xs, cells, na, nb, oh, ow, out_dtype, t=8, interpret=False):
    """xs: [B, Hs, Ws, Cs2d] s2d input (already padded so that output (y, x)
    = sum_cells xs[y+a, x+b] . cells[a*nb+b], with possible extra trailing
    rows/cols from the s2d rounding); cells: [na*nb, Cs2d, cout].
    Output [B, oh, ow, cout]."""
    b, hs, ws, cs2d = xs.shape
    cout = cells.shape[-1]
    hp = -(-oh // t) * t
    wpad = -(-max(ws, ow + nb - 1) // 8) * 8
    nbands = hp // t

    xp = jnp.pad(xs, ((0, 0), (0, max(0, hp + na - 1 - hs)), (0, wpad - ws), (0, 0)))
    bands = jnp.stack(
        [xp[:, i * t : i * t + t + na - 1] for i in range(nbands)], axis=1
    )

    out = pl.pallas_call(
        functools.partial(_kernel, na=na, nb=nb, t=t, w=ow),
        grid=(b, nbands),
        in_specs=[
            pl.BlockSpec((1, 1, t + na - 1, wpad, cs2d),
                         lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((na * nb, cs2d, cout), lambda i, j: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, t, ow, cout), lambda i, j: (i, j, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, hp, ow, cout), out_dtype),
        interpret=interpret,
    )(bands, cells)
    return out[:, :oh]


def _reference(xs, cells, na, nb, oh, ow, out_dtype):
    """jnp twin: the per-cell accumulation exactly as models/layers.py."""
    acc = None
    for a in range(na):
        for bb in range(nb):
            sl = xs[:, a : a + oh, bb : bb + ow, :]
            part = jnp.einsum("bhwc,co->bhwo", sl, cells[a * nb + bb],
                              preferred_element_type=jnp.float32)
            acc = part if acc is None else acc + part
    return acc.astype(out_dtype)


@functools.lru_cache(maxsize=None)
def _with_vjp(na: int, nb: int, oh: int, ow: int, out_dtype):
    @jax.custom_vjp
    def f(xs, cells):
        return _strided_conv_impl(xs, cells, na, nb, oh, ow, out_dtype)

    def fwd(xs, cells):
        return f(xs, cells), (xs, cells)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda a, c: _reference(a, c, na, nb, oh, ow, out_dtype), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def strided_conv_cells(xs: jnp.ndarray, cells: jnp.ndarray, na: int, nb: int,
                       oh: int, ow: int, out_dtype,
                       interpret: bool = False) -> jnp.ndarray:
    """VMEM-accumulated cell-matmul convolution. Falls back to the jnp twin
    on CPU. Same values as the XLA per-cell accumulation up to f32 summation
    order (the dots themselves are identical; only the partial adds are
    reassociated)."""
    if interpret:
        return _strided_conv_impl(xs, cells, na, nb, oh, ow, out_dtype, interpret=True)
    if jax.default_backend() == "cpu":
        return _reference(xs, cells, na, nb, oh, ow, out_dtype)
    return _with_vjp(na, nb, oh, ow, jnp.dtype(out_dtype))(xs, cells)
