"""Fused local-correlation softmax-expectation Pallas kernel.

The scale-1 local matching step (reference matching.py:39-83;
ops/correlation.py::local_correlation_softmax) computes a (2R+1)^2-offset
window correlation and immediately reduces it to an expected flow — the
model discards the probability output (models/unimatch.py:236). The XLA
form materializes extract_patches [B, H, W, K*K, C] (~594 MB at the
flagship scale-1 shape) plus an f32 [B, H, W, 81] softmax round-trip:
~1.2 GB of HBM traffic for a 4.6 MB result.

This kernel streams the 81 offsets with an online (flash-style) softmax —
running max / sum / expectation accumulators over [T, W] row bands — so
HBM traffic is one read of f0, ~1.15 reads of f1 (the XLA-side banding
copy), and the two [B, H, W] flow planes out. Offsets outside the image
are masked to -1e9 exactly like the reference; zero-padding of f1
contributes nothing because those offsets are masked, not read as zeros.

Backward runs the jnp twin's vjp (pallas_call has no autodiff).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(f0_ref, f1b_ref, fx_ref, fy_ref, *, ry: int, rx: int, h: int,
            w: int, t: int, wc: int, scale: float):
    """One (batch, row-band, column-band) cell of the streaming window corr.

    Scoped-VMEM design (the round-3 form OOMed at 65.4 MB vs the 16 MB
    limit at the flagship s1 shape): the 81-offset loop was fully unrolled
    in the Mosaic IR, keeping ~one f32 [T, W, C] product temporary live per
    offset. Two changes bound the footprint: (a) columns are sub-blocked
    (grid axis 2, wc columns per cell) so each temporary is [T, WC, C],
    and (b) the dy loop is a lax.fori_loop — only the 2rx+1 static dx
    slices are unrolled per body, so live temporaries are O(2rx+1), not
    O((2ry+1)(2rx+1)).
    """
    f0 = f0_ref[0].astype(jnp.float32)  # [T, WC, C]

    row0 = pl.program_id(1) * t
    col0 = pl.program_id(2) * wc
    rows = row0 + jax.lax.broadcasted_iota(jnp.int32, (t, wc), 0)
    cols = col0 + jax.lax.broadcasted_iota(jnp.int32, (t, wc), 1)

    neg = jnp.float32(-1e9)
    init = (
        jnp.full((t, wc), -jnp.inf, jnp.float32),
        jnp.zeros((t, wc), jnp.float32),
        jnp.zeros((t, wc), jnp.float32),
        jnp.zeros((t, wc), jnp.float32),
    )

    def body(dy, carry):
        m, s, fx, fy = carry
        # dynamic row-base load from the REF (pl.dslice): Mosaic has no
        # lowering for lax.dynamic_slice on a loaded VALUE (round-4d
        # NotImplementedError) — dynamic indexing must happen at the memory
        # access, and only on a major dim
        bandy = f1b_ref[0, 0, 0, pl.dslice(dy, t), :, :]  # [T, WCpad, C]
        offy = (dy - ry).astype(jnp.float32)
        rowy = rows + (dy - ry)
        rvalid = (rowy >= 0) & (rowy < h)
        for dx in range(2 * rx + 1):
            f1s = bandy[:, dx : dx + wc, :].astype(jnp.float32)
            ck = jnp.sum(f0 * f1s, axis=-1) * scale  # [T, WC]
            colx = cols + (dx - rx)
            ck = jnp.where(rvalid & (colx >= 0) & (colx < w), ck, neg)
            mn = jnp.maximum(m, ck)
            rescale = jnp.exp(m - mn)
            p = jnp.exp(ck - mn)
            s = s * rescale + p
            fx = fx * rescale + p * jnp.float32(dx - rx)
            fy = fy * rescale + p * offy
            m = mn
        return m, s, fx, fy

    _, s, fx, fy = jax.lax.fori_loop(0, 2 * ry + 1, body, init)
    fx_ref[0] = fx / s
    fy_ref[0] = fy / s


@functools.partial(jax.jit, static_argnames=("ry", "rx", "t", "wc", "interpret"))
def _local_corr_flow_impl(f0, f1, ry, rx=None, t=8, wc=128, interpret=False):
    if rx is None:
        rx = ry
    b, h, w, c = f0.shape
    hp = -(-h // t) * t
    nb = hp // t
    # column sub-blocks: wc columns per grid cell (8-aligned), covering w
    wc = min(wc, -(-w // 8) * 8)
    wp = -(-w // wc) * wc
    ncol = wp // wc
    wcb = -(-(wc + 2 * rx) // 8) * 8  # padded band width per column block

    f0p = jnp.pad(f0, ((0, 0), (0, hp - h), (0, wp - w), (0, 0)))
    f1p = jnp.pad(f1, ((0, 0), (ry, hp - h + ry), (rx, wcb + wp - w - rx), (0, 0)))
    # overlapping row/column bands cannot be expressed as disjoint BlockSpec
    # blocks — materialize them XLA-side (the same trick as
    # kernels/gru_fused.py): ~(T+2ry)/T x (1 + 2rx/wc) x one extra f1 copy
    f1b = jnp.stack(
        [
            jnp.stack(
                [f1p[:, i * t : i * t + t + 2 * ry, j * wc : j * wc + wcb]
                 for j in range(ncol)],
                axis=1,
            )
            for i in range(nb)
        ],
        axis=1,
    )  # [B, nb, ncol, T+2ry, wcb, C]

    scale = 1.0 / (c**0.5)
    fx, fy = pl.pallas_call(
        functools.partial(_kernel, ry=ry, rx=rx, h=h, w=w, t=t, wc=wc, scale=scale),
        grid=(b, nb, ncol),
        in_specs=[
            pl.BlockSpec((1, t, wc, c), lambda i, j, k: (i, j, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, t + 2 * ry, wcb, c),
                         lambda i, j, k: (i, j, k, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, t, wc), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, t, wc), lambda i, j, k: (i, j, k),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
            jax.ShapeDtypeStruct((b, hp, wp), jnp.float32),
        ],
        interpret=interpret,
    )(f0p, f1b)
    return jnp.stack([fx[:, :h, :w], fy[:, :h, :w]], axis=-1)


# A streaming local-window-propagation kernel (softmax-expectation over the
# (2r+1)^2 window with pre-shifted value planes) lived here through rounds
# 4-5. On chip it was numerically wrong (718 abs error at flagship shapes;
# the interpret-mode test passed) with no speed win once the round-5 combo
# landed (docs/PERF_NOTES.md round-5d) — deleted, the extract_patches XLA
# form in models/propagation.py is the kept implementation.


def _reference_flow(f0, f1, local_radius):
    """jnp twin: the flow half of ops.correlation.local_correlation_softmax."""
    from unimatch_tpu.ops.correlation import local_correlation_softmax

    flow, _ = local_correlation_softmax(f0, f1, local_radius)
    return flow.astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _with_vjp(local_radius: int):
    @jax.custom_vjp
    def f(f0, f1):
        return _local_corr_flow_impl(f0, f1, local_radius)

    def fwd(f0, f1):
        return f(f0, f1), (f0, f1)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda a, b_: _reference_flow(a, b_, local_radius), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def local_corr_softmax_flow(f0: jnp.ndarray, f1: jnp.ndarray,
                            local_radius: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Expected local flow: softmax((2R+1)^2-window correlation) · offsets.

    f0, f1: [B, H, W, C] -> flow [B, H, W, 2] (f32; cast by the caller).
    Same values as local_correlation_softmax(...)[0] up to f32 summation
    order (online vs two-pass softmax). Falls back to the jnp twin on CPU.
    """
    if interpret:
        return _local_corr_flow_impl(f0, f1, local_radius, interpret=True)
    if jax.default_backend() == "cpu":
        return _reference_flow(f0, f1, local_radius)
    return _with_vjp(local_radius)(f0, f1)


def _reference_disp(f0, f1, local_radius):
    """jnp twin: the disparity half of local_correlation_softmax_stereo."""
    from unimatch_tpu.ops.correlation import local_correlation_softmax_stereo

    disp, _ = local_correlation_softmax_stereo(f0, f1, local_radius)
    return disp.astype(jnp.float32)


@functools.lru_cache(maxsize=None)
def _stereo_with_vjp(local_radius: int):
    @jax.custom_vjp
    def f(f0, f1):
        # 1-D horizontal window: ry=0; disparity = -E[offset_x]
        return -_local_corr_flow_impl(f0, f1, 0, local_radius)[..., :1]

    def fwd(f0, f1):
        return f(f0, f1), (f0, f1)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda a, b_: _reference_disp(a, b_, local_radius), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def local_corr_softmax_disp(f0: jnp.ndarray, f1: jnp.ndarray,
                            local_radius: int,
                            interpret: bool = False) -> jnp.ndarray:
    """Expected local disparity: the 1-D (horizontal) window variant for
    stereo — same values as local_correlation_softmax_stereo(...)[0] up to
    f32 summation order. [B, H, W, C] -> [B, H, W, 1] f32."""
    if interpret:
        return -_local_corr_flow_impl(f0, f1, 0, local_radius, interpret=True)[..., :1]
    if jax.default_backend() == "cpu":
        return _reference_disp(f0, f1, local_radius)
    return _stereo_with_vjp(local_radius)(f0, f1)
