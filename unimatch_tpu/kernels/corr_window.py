"""Pallas kernel: flow-shifted local correlation (RAFT-style lookup).

corr[p, n] = <f0[p], bilinear(f1, p + flow[p] + n)> for integer offsets n in a
(2R+1)^2 window — the hot op of regression refinement (6 iterations in the
flagship). The jnp path gathers the (2R+2)^2 unique bilinear footprint per
pixel from HBM (~740 MB of scattered reads per call at Sintel 1/4 scale);
this kernel keeps the zero-padded f1 resident in VMEM and reads each pixel's
footprint with dynamic slices, reducing channels on the spot.

Mosaic constraints shape the design:
  * dynamic sublane (W-axis) offsets must be 8-aligned -> slice an aligned
    24-wide band and select the 10 wanted columns with a branchless
    iota-comparison matmul;
  * sublane writes must be 8-aligned -> pixels are processed in groups of 8
    and written as one [8, 128] tile.

Grid: (B, H/8) — 8 image rows per step. Requires padded f1 in VMEM (~9.3 MB
at 1/4-scale Sintel bf16); callers fall back to the jnp path otherwise.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_F1_VMEM_BYTES = 10 * 1024 * 1024
_ROWS = 8  # image rows per grid step
_BAND = 24  # aligned W-band width covering base..base+7+10


def _kernel(f0_ref, iy_ref, ix_ref, f1_ref, o_ref, *, r: int):
    k = 2 * r + 1
    kk = k + 1
    w = f0_ref.shape[2]

    col_iota = jax.lax.broadcasted_iota(jnp.int32, (_BAND, 16), 0)
    sel_iota = jax.lax.broadcasted_iota(jnp.int32, (_BAND, 16), 1)

    def body(i, _):
        row = i // w
        px = i % w
        iy0 = iy_ref[0, row, px]
        ix0 = ix_ref[0, row, px]
        ix_base = pl.multiple_of((ix0 // 8) * 8, 8)
        rem = ix0 - ix_base

        patch = f1_ref[0, pl.ds(iy0, kk), pl.ds(ix_base, _BAND), :]  # [kk, 24, C]
        f0v = f0_ref[0, row, px, :].astype(jnp.float32)  # [C]
        cp24 = jnp.sum(patch.astype(jnp.float32) * f0v[None, None, :], axis=-1)  # [kk, 24]

        # branchless dynamic column selection: S[m, j] = (m == rem + j)
        sel = (col_iota == (sel_iota + rem)).astype(jnp.float32)  # [24, 16]
        cp = jax.lax.dot_general(
            cp24, sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )  # [kk, 16], cols 0..kk-1 = cp24[:, rem:rem+kk]

        # bilinear blend and flattening happen outside (XLA) — the kernel
        # emits the selected footprint patch with full trailing dims, which
        # keeps every in-kernel shape Mosaic-legal (no shape casts).
        o_ref[0, row, px] = cp
        return 0

    jax.lax.fori_loop(0, _ROWS * w, body, 0)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def corr_window_pallas(
    f0: jnp.ndarray,  # [B, H, W, C]
    f1_padded: jnp.ndarray,  # [B, H+2P, W+2P+16, C], P = 2R+2 zero pad (+16 W slack)
    iy0: jnp.ndarray,  # [B, H, W] int32 clamped slice starts (padded coords)
    ix0: jnp.ndarray,
    wx1: jnp.ndarray,  # [B, H, W] fp32 bilinear fractions
    wy1: jnp.ndarray,
    r: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, w, c = f0.shape
    k = 2 * r + 1
    kk = k + 1
    assert h % _ROWS == 0, "pad H to a multiple of 8 before calling"
    cp = pl.pallas_call(
        functools.partial(_kernel, r=r),
        grid=(b, h // _ROWS),
        in_specs=[
            pl.BlockSpec((1, _ROWS, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1,) + f1_padded.shape[1:], lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, _ROWS, w, kk, 16), lambda i, j: (i, j, 0, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, kk, 16), jnp.float32),
        interpret=interpret,
    )(
        f0,
        iy0.astype(jnp.int32),
        ix0.astype(jnp.int32),
        f1_padded,
    )
    # bilinear blend of the 4 corners (XLA elementwise pass over the patches)
    wx1 = wx1.astype(jnp.float32)[..., None, None]
    wy1 = wy1.astype(jnp.float32)[..., None, None]
    c00 = cp[..., 0:k, 0:k]
    c01 = cp[..., 0:k, 1 : k + 1]
    c10 = cp[..., 1 : k + 1, 0:k]
    c11 = cp[..., 1 : k + 1, 1 : k + 1]
    corr = (
        c00 * (1 - wy1) * (1 - wx1)
        + c01 * (1 - wy1) * wx1
        + c10 * wy1 * (1 - wx1)
        + c11 * wy1 * wx1
    )
    return corr.reshape(b, h, w, k * k)


def prepare_inputs(f1: jnp.ndarray, flow: jnp.ndarray, r: int = 4):
    """Zero-pad f1 and compute clamped slice starts + bilinear fractions."""
    b, h, w, _ = f1.shape
    k = 2 * r + 1
    kk = k + 1
    p = kk
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs[None] + flow[..., 0].astype(jnp.float32)
    fy = ys[None] + flow[..., 1].astype(jnp.float32)
    bx = jnp.floor(fx)
    by = jnp.floor(fy)
    # extra 16 columns of slack on the right for the aligned 24-wide band
    f1p = jnp.pad(f1, ((0, 0), (p, p), (p, p + 16), (0, 0)))
    iy0 = jnp.clip(by - r + p, 0, h + 2 * p - kk)
    ix0 = jnp.clip(bx - r + p, 0, w + 2 * p - kk)
    return f1p, iy0, ix0, fx - bx, fy - by


def fits_vmem(f1_padded_shape, dtype_bytes: int = 2) -> bool:
    _, hp, wp, c = f1_padded_shape
    return hp * wp * c * dtype_bytes <= _MAX_F1_VMEM_BYTES
