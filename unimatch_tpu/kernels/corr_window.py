"""Pallas kernel: flow-shifted local correlation (RAFT-style lookup).

corr[p, n] = <f0[p], bilinear(f1, p + flow[p] + n)> for integer offsets n in a
(2R+1)^2 window — the hot op of regression refinement (6 iterations in the
flagship). The jnp path gathers the (2R+2)^2 unique bilinear footprint per
pixel from HBM (~740 MB of scattered reads per call at Sintel 1/4 scale);
this kernel keeps the zero-padded f1 resident in VMEM and reads each pixel's
contiguous footprint with dynamic slices, reducing channels on the spot.

Grid: (B, H). Per step: one image row. Requires the padded f1 to fit VMEM
(~9.3 MB at 1/4-scale Sintel in bf16); callers fall back to the jnp path
otherwise (unimatch_tpu.ops.correlation.local_correlation_with_flow).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_F1_VMEM_BYTES = 10 * 1024 * 1024


def _kernel(f0_ref, iy_ref, ix_ref, wx_ref, wy_ref, f1_ref, o_ref, *, r: int):
    k = 2 * r + 1
    kk = k + 1
    w = f0_ref.shape[2]

    def body(px, _):
        iy0 = iy_ref[0, 0, px]
        ix0 = ix_ref[0, 0, px]
        patch = f1_ref[0, pl.ds(iy0, kk), pl.ds(ix0, kk), :]  # [kk, kk, C]
        f0v = f0_ref[0, 0, px, :]  # [C]
        cp = jnp.sum(
            patch.astype(jnp.float32) * f0v.astype(jnp.float32)[None, None, :], axis=-1
        )  # [kk, kk] fp32

        wx1 = wx_ref[0, 0, px]
        wy1 = wy_ref[0, 0, px]
        c00 = cp[0:k, 0:k]
        c01 = cp[0:k, 1 : k + 1]
        c10 = cp[1 : k + 1, 0:k]
        c11 = cp[1 : k + 1, 1 : k + 1]
        corr = (
            c00 * (1 - wy1) * (1 - wx1)
            + c01 * (1 - wy1) * wx1
            + c10 * wy1 * (1 - wx1)
            + c11 * wy1 * wx1
        )  # [k, k]
        out = jnp.pad(corr.reshape(1, k * k), ((0, 0), (0, 128 - k * k)))
        o_ref[0, 0, pl.ds(px, 1), :] = out
        return 0

    jax.lax.fori_loop(0, w, body, 0)


@functools.partial(jax.jit, static_argnames=("r", "interpret"))
def corr_window_pallas(
    f0: jnp.ndarray,  # [B, H, W, C]
    f1_padded: jnp.ndarray,  # [B, H+2P, W+2P, C], P = 2R+2 zero pad
    iy0: jnp.ndarray,  # [B, H, W] int32 clamped slice starts (padded coords)
    ix0: jnp.ndarray,
    wx1: jnp.ndarray,  # [B, H, W] fp32 bilinear fractions
    wy1: jnp.ndarray,
    r: int = 4,
    interpret: bool = False,
) -> jnp.ndarray:
    b, h, w, c = f0.shape
    k = 2 * r + 1
    out = pl.pallas_call(
        functools.partial(_kernel, r=r),
        grid=(b, h),
        in_specs=[
            pl.BlockSpec((1, 1, w, c), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, w), lambda i, j: (i, j, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1,) + f1_padded.shape[1:], lambda i, j: (i, 0, 0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((1, 1, w, 128), lambda i, j: (i, j, 0, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, 128), jnp.float32),
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


def fits_vmem(f1_shape, dtype_bytes: int = 2) -> bool:
    _, hp, wp, c = (0,) + tuple(f1_shape[1:]) if len(f1_shape) == 4 else f1_shape
    return f1_shape[1] * f1_shape[2] * f1_shape[3] * dtype_bytes <= _MAX_F1_VMEM_BYTES
