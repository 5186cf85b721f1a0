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

Grid: (B, H/8) — 8 image rows per step.

STATUS: measured ~3x SLOWER than the XLA row-gather on v5e (per-pixel
scalar-loop overhead dominates; see docs/PERF_NOTES.md) — kept with tests as
a documented design-space exploration, NOT dispatched from the model.
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


def _kernel(f0_ref, iy_ref, ix_ref, wx_ref, wy_ref, f1_hbm, o_ref, f1_vmem, dma_sem, *, r: int):
    k = 2 * r + 1
    kk = k + 1
    w = f0_ref.shape[2]

    # copy f1 into the persistent VMEM scratch once per batch item
    @pl.when(pl.program_id(1) == 0)
    def _():
        dma = pltpu.make_async_copy(f1_hbm.at[0], f1_vmem, dma_sem)
        dma.start()
        dma.wait()

    # constant index maps for the fused select+blend matrices:
    #   out lane n encodes window tap (dy, dx) = (n // k, n % k) for n < k*k
    m_iota = jax.lax.broadcasted_iota(jnp.int32, (_BAND, 128), 0)
    n_iota = jax.lax.broadcasted_iota(jnp.int32, (_BAND, 128), 1)
    dx_map = n_iota % k
    lane_valid = (n_iota < k * k)

    # constant [kk, 128] row-selection masks for the y-blend
    a_iota = jax.lax.broadcasted_iota(jnp.int32, (kk, 128), 0)
    ndy = jax.lax.broadcasted_iota(jnp.int32, (kk, 128), 1) // k
    wy0_const = (ndy == a_iota).astype(jnp.float32)
    wy1_const = (ndy == (a_iota - 1)).astype(jnp.float32)

    def body(i, _):
        row = i // (w // 8)
        g = i % (w // 8)
        f0blk = f0_ref[0, row, pl.ds(pl.multiple_of(8 * g, 8), 8), :].astype(jnp.float32)

        group_rows = []
        for gi in range(8):  # static unroll within the aligned group
            px = 8 * g + gi
            iy0 = iy_ref[0, row, px]
            ix0 = ix_ref[0, row, px]
            ix_base = pl.multiple_of((ix0 // 8) * 8, 8)
            rem = ix0 - ix_base
            wx1 = wx_ref[0, row, px]
            wy1 = wy_ref[0, row, px]

            patch = f1_vmem[pl.ds(iy0, kk), pl.ds(ix_base, _BAND), :]  # [kk, 24, C]
            f0v = f0blk[gi]  # [C], static sublane index
            cp24 = jnp.sum(
                patch.astype(jnp.float32) * f0v[None, None, :], axis=-1
            )  # [kk, 24]

            # fused dynamic-column selection + bilinear x-blend:
            #   blendS[m, n] = wx0 * (m == rem + dx) + wx1 * (m == rem + dx + 1)
            s0 = (m_iota == (dx_map + rem)) & lane_valid
            s1 = (m_iota == (dx_map + rem + 1)) & lane_valid
            blend_s = (1.0 - wx1) * s0.astype(jnp.float32) + wx1 * s1.astype(jnp.float32)

            # y-blend folded into a constant row-selection matrix:
            #   DY[a, n] = wy0 * (dy(n) == a) + wy1 * (dy(n) == a - 1)
            dy_sel = wy0_const * (1.0 - wy1) + wy1_const * wy1  # [kk, 128]

            # flat[n] = sum_m blendS[m, n] * (sum_a cp24[a, m] * DY[a, n])
            cp_y = jax.lax.dot_general(
                cp24, dy_sel, (((0,), (0,)), ((), ())), preferred_element_type=jnp.float32
            )  # [24, 128]
            flat = jnp.sum(blend_s * cp_y, axis=0, keepdims=True)  # [1, 128]
            group_rows.append(flat)

        tile = jnp.concatenate(group_rows, axis=0).astype(o_ref.dtype)  # [8, 128]
        o_ref[0, pl.ds(row, 1), pl.ds(pl.multiple_of(8 * g, 8), 8), :] = tile[None]
        return 0

    jax.lax.fori_loop(0, _ROWS * (w // 8), body, 0)


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
    assert h % _ROWS == 0 and w % 8 == 0, "pad H, W to multiples of 8 before calling"
    out = pl.pallas_call(
        functools.partial(_kernel, r=r),
        grid=(b, h // _ROWS),
        in_specs=[
            pl.BlockSpec((1, _ROWS, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _ROWS, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, _ROWS, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),  # f1 stays in HBM, DMA'd once
        ],
        out_specs=pl.BlockSpec(
            (1, _ROWS, w, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM(f1_padded.shape[1:], f1_padded.dtype),
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(
        f0,
        iy0.astype(jnp.int32),
        ix0.astype(jnp.int32),
        wx1.astype(jnp.float32),
        wy1.astype(jnp.float32),
        f1_padded,
    )
    return out[..., : k * k]


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
    # extra right slack for the aligned 24-wide band; total padded width is
    # rounded to a multiple of 8 (DMA slice alignment)
    wp_total = w + 2 * p + 16
    wp_total = -(-wp_total // 8) * 8
    f1p = jnp.pad(f1, ((0, 0), (p, p), (p, wp_total - w - p), (0, 0)))
    iy0 = jnp.clip(by - r + p, 0, h + 2 * p - kk)
    ix0 = jnp.clip(bx - r + p, 0, w + 2 * p - kk)
    return f1p, iy0, ix0, fx - bx, fy - by


def fits_vmem(f1_padded_shape, dtype_bytes: int = 2) -> bool:
    _, hp, wp, c = f1_padded_shape
    return hp * wp * c * dtype_bytes <= _MAX_F1_VMEM_BYTES
