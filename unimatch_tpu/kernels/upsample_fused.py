"""Fused RAFT convex-upsample Pallas kernel.

upsample_with_mask (reference utils.py:134-152; ops/upsample.py) softmaxes
a 9-way neighbor mask per output subpixel and convex-combines the 3x3 flow
neighborhood. The XLA form round-trips the [B, H, W, 9, K, K] f32 softmax
(~66 MB at the flagship shape) and the [B, H, W, K, K, Cf] einsum output
through HBM, plus a final merge relayout.

Here one row-banded kernel reads the mask once (lane-sliced into its nine
64-lane neighbor groups — Mosaic handles arbitrary static lane slices, the
same pattern as kernels/corr_volume.py), computes the 9-way softmax and the
convex combination entirely in VMEM, and writes per-channel [T*W, K*K]
planes; the caller's single transpose+reshape assembles [B, KH, KW, Cf].

Backward runs the jnp twin's vjp (pallas_call has no autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(m_ref, v_ref, o_ref, *, kk: int, cf: int, mult: float):
    """mask m_ref[0]: [9, TW, KK] (neighbor groups on a LEADING axis —
    in-kernel sub-vreg lane slicing of a [TW, 9*KK] layout crashes the
    Mosaic compile helper, leading-axis indexing is the proven
    corr_volume.py pattern); values v_ref[0]: [TW, 9*cf] pre-shifted flow
    neighbors (zero-filled borders, built XLA-side — flow is ~150 KB, so 9
    shifted copies are trivial; the in-kernel [T+2, Wpad, Cf] band slicing
    + lane extraction this replaces also crashes the compile helper at
    W=256). Width-1 lane slices of the value broadcast against the
    [TW, KK] weights (probe-verified at these shapes)."""
    n9 = 9
    mask = m_ref[0].astype(jnp.float32)  # [9, TW, KK]
    vals = v_ref[0].astype(jnp.float32)  # [TW, 9*Cf]

    groups = [mask[n] for n in range(n9)]  # 9 x [TW, KK]
    m = groups[0]
    for g in groups[1:]:
        m = jnp.maximum(m, g)
    ps = [jnp.exp(g - m) for g in groups]
    s = ps[0]
    for p in ps[1:]:
        s = s + p

    acc = [jnp.zeros(ps[0].shape, jnp.float32) for _ in range(cf)]
    for n in range(n9):
        for c in range(cf):
            i = n * cf + c
            acc[c] = acc[c] + ps[n] * vals[:, i : i + 1]
    for c in range(cf):
        o_ref[c, 0] = ((acc[c] / s) * jnp.float32(mult)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("upsample_factor", "is_depth", "t", "interpret"))
def _upsample_impl(flow, mask, upsample_factor, is_depth, t=None, interpret=False):
    b, h, w, cf = flow.shape
    k = upsample_factor
    kk = k * k
    if t is None:
        # Mosaic crash line (round-4i bisection): elementwise chains on
        # [T*W, KK] tiles crash the compile helper at 2048 sublanes and
        # compile at <= 1024 — cap the row band so T*W <= 1024. When w
        # alone exceeds 1024 even t=1 can't satisfy the cap (would need
        # column blocking) — fail loudly instead of re-entering the
        # compile-crash regime with an opaque relay HTTP 500.
        if w > 1024:
            raise ValueError(
                f"upsample_with_mask_fused: width {w} > 1024 exceeds the "
                "Mosaic-safe T*W bound; use the XLA path for this shape"
            )
        t = max(1, 1024 // w)
    hp = -(-h // t) * t
    nb = hp // t

    mp = jnp.pad(mask, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    # neighbor groups to a leading axis: [B, hp*w, 9, KK] -> [B, 9, hp*w, KK]
    mp = mp.reshape(b, hp * w, 9, kk).transpose(0, 2, 1, 3)
    # 9 pre-shifted flow neighbor maps, (dy, dx) minor-major as the mask's
    # 9-group channel layout: plane n*cf+c at (y, x) = flow[y+n//3-1, x+n%3-1, c]
    fp = jnp.pad(flow, ((0, 0), (1, hp - h + 1), (1, 1), (0, 0)))
    vs = jnp.concatenate(
        [fp[:, dy : dy + hp, dx : dx + w] for dy in range(3) for dx in range(3)],
        axis=-1,
    )  # [B, hp, w, 9*cf]
    vs = vs.reshape(b, hp * w, 9 * cf)

    mult = 1.0 if is_depth else float(k)
    out = pl.pallas_call(
        functools.partial(_kernel, kk=kk, cf=cf, mult=mult),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 9, t * w, kk), lambda i, j: (i, 0, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t * w, 9 * cf), lambda i, j: (i, j, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cf, 1, t * w, kk), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cf, b, hp * w, kk), flow.dtype),
        interpret=interpret,
    )(mp, vs)
    # [Cf, B, H*W, K*K] -> [B, H, Ky, W, Kx, Cf] -> [B, KH, KW, Cf]
    up = out[:, :, : h * w].reshape(cf, b, h, w, k, k)
    up = up.transpose(1, 2, 4, 3, 5, 0)
    return up.reshape(b, h * k, w * k, cf)


def _reference(flow, mask, upsample_factor, is_depth):
    from unimatch_tpu.ops.upsample import upsample_with_mask

    return upsample_with_mask(flow, mask, upsample_factor, is_depth=is_depth)


@functools.lru_cache(maxsize=None)
def _with_vjp(upsample_factor: int, is_depth: bool):
    @jax.custom_vjp
    def f(flow, mask):
        return _upsample_impl(flow, mask, upsample_factor, is_depth)

    def fwd(flow, mask):
        return f(flow, mask), (flow, mask)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda a, b_: _reference(a, b_, upsample_factor, is_depth), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def upsample_with_mask_fused(flow: jnp.ndarray, mask: jnp.ndarray,
                             upsample_factor: int, is_depth: bool = False,
                             interpret: bool = False) -> jnp.ndarray:
    """Convex upsampling. flow: [B, H, W, Cf]; mask: [B, H, W, 9*K*K]
    ((9, Ky, Kx) channel layout). Same values as ops.upsample.
    upsample_with_mask up to f32 rounding (this kernel keeps the softmax
    and combination in f32 end to end; the XLA form rounds the patch
    product through the flow dtype)."""
    if interpret:
        return _upsample_impl(flow, mask, upsample_factor, is_depth, interpret=True)
    if jax.default_backend() == "cpu":
        return _reference(flow, mask, upsample_factor, is_depth)
    return _with_vjp(upsample_factor, bool(is_depth))(flow, mask)
