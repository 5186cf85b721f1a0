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


def _kernel(m_ref, fb_ref, o_ref, *, t: int, w: int, kk: int, cf: int,
            mult: float):
    n9 = 9
    mask = m_ref[0].reshape(t * w, n9 * kk).astype(jnp.float32)  # [TW, 576]
    band = fb_ref[0, 0]  # [T+2, Wpad, Cf]

    groups = [mask[:, n * kk : (n + 1) * kk] for n in range(n9)]  # 9 x [TW, KK]
    m = groups[0]
    for g in groups[1:]:
        m = jnp.maximum(m, g)
    ps = [jnp.exp(g - m) for g in groups]
    s = ps[0]
    for p in ps[1:]:
        s = s + p

    acc = [jnp.zeros((t * w, kk), jnp.float32) for _ in range(cf)]
    for n in range(n9):
        dy, dx = n // 3, n % 3
        # [T, W, Cf] -> [T*W, Cf] (major collapse, lanes intact), then a
        # width-1 lane slice broadcasts against the [T*W, KK] weights
        fn = band[dy : dy + t, dx : dx + w, :].reshape(t * w, cf).astype(jnp.float32)
        for c in range(cf):
            acc[c] = acc[c] + ps[n] * fn[:, c : c + 1]
    for c in range(cf):
        o_ref[c, 0] = ((acc[c] / s) * jnp.float32(mult)).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("upsample_factor", "is_depth", "t", "interpret"))
def _upsample_impl(flow, mask, upsample_factor, is_depth, t=8, interpret=False):
    b, h, w, cf = flow.shape
    k = upsample_factor
    kk = k * k
    hp = -(-h // t) * t
    wpad = -(-(w + 2) // 8) * 8
    nb = hp // t

    mp = jnp.pad(mask, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
    fp = jnp.pad(flow, ((0, 0), (1, hp - h + 1), (1, wpad - w - 1), (0, 0)))
    fb = jnp.stack([fp[:, i * t : i * t + t + 2] for i in range(nb)], axis=1)

    mult = 1.0 if is_depth else float(k)
    out = pl.pallas_call(
        functools.partial(_kernel, t=t, w=w, kk=kk, cf=cf, mult=mult),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, t, w, 9 * kk), lambda i, j: (i, j, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, t + 2, wpad, cf), lambda i, j: (i, j, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cf, 1, t * w, kk), lambda i, j: (0, i, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cf, b, hp * w, kk), flow.dtype),
        interpret=interpret,
    )(mp, fb)
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
