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
import os

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


def _pick_m_block(m: int, target: int = 2048, cap: int = 4096,
                  unit: int = TILE**2) -> int:
    """Largest multiple-of-`unit` divisor of m that is <= cap."""
    units = m // unit
    best = 1
    for u in range(1, units + 1):
        if units % u == 0 and u * unit <= cap:
            best = u
    return best * unit


# ---------------------------------------------------------------------------
# volume build: vt[b, p, m] = <f0[b, p, :], f1b[b, m, :]>  (f32 acc -> bf16)
# ---------------------------------------------------------------------------


def _build_kernel(f0_ref, f1b_ref, o_ref):
    o_ref[0] = jax.lax.dot_general(
        f0_ref[0], f1b_ref[0], (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ).astype(o_ref.dtype)


def _build_kernel_u(f0_ref, f1b_ref, o_ref):
    """Unit-major output: o [1, nu_blk, block_p, TILE^2] — one dot per unit
    (static leading-axis writes), so the volume lands DIRECTLY in the
    layout the lookup's row gather consumes ([B*nUnits*Ppad, 256] is a
    no-op bitcast of [B, nUnits, Ppad, 256]). The round-5 profiler trace
    showed the p-major form paying a 1.76 GB physical relayout copy
    (5.6 ms/fwd at the flagship shape) between the build and the gather."""
    nu = o_ref.shape[1]
    tt = o_ref.shape[3]
    for k in range(nu):
        o_ref[0, k] = jax.lax.dot_general(
            f0_ref[0], f1b_ref[0, k * tt : (k + 1) * tt, :],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        ).astype(o_ref.dtype)


def _build_kernel_uq(f0_ref, f1b_ref, inv_ref, o_ref):
    """Unit-major build with per-unit int8 quantization (the round-5
    UNIMATCH_VOLUME_INT8 lever): q = rint(corr * inv_scale[u]) in int8,
    where inv_scale[u] = 127 / (max_p ||f0_p|| * max_{m in u} ||f1_m||) is
    a rigorous Cauchy-Schwarz bound — no clipping can occur, so no clamp.
    Halves the volume's HBM write traffic and every later gather/read;
    the lookup kernel dequantizes per unit at span assembly.

    inv_ref is the FULL [1, nUnits] scale row in SMEM (a (1, nu_blk) VMEM
    block fails Mosaic's 8x128 block-divisibility rule); the kernel offsets
    by the m-block's program id."""
    nu = o_ref.shape[1]
    tt = o_ref.shape[3]
    u0 = pl.program_id(2) * nu
    for k in range(nu):
        acc = jax.lax.dot_general(
            f0_ref[0], f1b_ref[0, k * tt : (k + 1) * tt, :],
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32,
        )
        o_ref[0, k] = jnp.rint(acc * inv_ref[0, u0 + k]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_p", "interpret", "unit_rows"))
def _build_volume_q_impl(f0, f1b, inv_scales, block_p=512, interpret=False,
                         unit_rows=TILE**2):
    """Quantized unit-major build: [B, nUnits, Ppad, unit_rows] int8.

    inv_scales: [B, nUnits] f32 per-unit quantization reciprocals (see
    _build_kernel_uq). unit_rows = TILE^2 for plain units, 2*TILE^2 for the
    y-paired volume (UNIMATCH_VOLUME_PAIR: each stored unit is a vertical
    tile pair, halving the lookup's gather-transaction count).
    Inference-only (no vjp — the volume dispatch is gated to inference mode
    in the model assembly)."""
    b, p, c = f0.shape
    m = f1b.shape[1]
    bm = _pick_m_block(m, unit=unit_rows)
    pp = -(-p // block_p) * block_p
    f0p = _pad_rows(f0, pp)
    tt = unit_rows
    nu_blk = bm // tt
    return pl.pallas_call(
        _build_kernel_uq,
        grid=(b, pp // block_p, m // bm),
        in_specs=[
            pl.BlockSpec((1, block_p, c), lambda i, j, k: (i, j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, c), lambda i, j, k: (i, k, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, m // tt), lambda i, j, k: (i, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, nu_blk, block_p, tt),
                               lambda i, j, k: (i, k, j, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, m // tt, pp, tt), jnp.int8),
        cost_estimate=pl.CostEstimate(
            flops=2 * b * pp * m * c,
            bytes_accessed=b * (pp * c + m * c) * 2 + b * pp * m,
            transcendentals=0,
        ),
        interpret=interpret,
    )(f0p, f1b, inv_scales)


def _build_reference_q(f0, f1b, inv_scales, pp, unit_rows=TILE**2):
    """jnp twin of the quantized unit-major build."""
    vu = _build_reference_u(f0, f1b, jnp.float32, pp, unit_rows)
    return jnp.rint(vu * inv_scales[:, :, None, None]).astype(jnp.int8)


@functools.partial(
    jax.jit,
    static_argnames=("out_dtype", "block_p", "interpret", "grid_order", "umajor"),
)
def _build_volume_impl(f0, f1b, out_dtype=jnp.bfloat16, block_p=512, interpret=False,
                       grid_order="mp", umajor=False):
    b, p, c = f0.shape
    m = f1b.shape[1]
    bm = _pick_m_block(m)
    pp = -(-p // block_p) * block_p
    f0p = _pad_rows(f0, pp)
    if umajor:
        # grid mp (p outer, m inner): f0 block resident across the unit sweep
        tt = TILE**2
        nu_blk = bm // tt
        return pl.pallas_call(
            _build_kernel_u,
            grid=(b, pp // block_p, m // bm),
            in_specs=[
                pl.BlockSpec((1, block_p, c), lambda i, j, k: (i, j, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, bm, c), lambda i, j, k: (i, k, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, nu_blk, block_p, tt),
                                   lambda i, j, k: (i, k, j, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((b, m // tt, pp, tt), out_dtype),
            cost_estimate=pl.CostEstimate(
                flops=2 * b * pp * m * c,
                bytes_accessed=b * (pp * c + m * c + pp * m) * 2,
                transcendentals=0,
            ),
            interpret=interpret,
        )(f0p, f1b)
    if grid_order == "mp":
        # p outer, m inner: the f0 block stays resident across the inner
        # sweep; every f1b block re-DMAs per step (M*C bytes per p-block)
        grid = (b, pp // block_p, m // bm)
        f0_map = lambda i, j, k: (i, j, 0)  # noqa: E731
        f1_map = lambda i, j, k: (i, k, 0)  # noqa: E731
        out_map = lambda i, j, k: (i, j, k)  # noqa: E731
    else:
        # "pm": m outer, p inner — f1b block resident across the inner sweep,
        # f0 (P*C bytes, ~18x smaller than M*C at flagship shape) re-streams
        # per m-block: ~6x less input re-read traffic overall
        grid = (b, m // bm, pp // block_p)
        f0_map = lambda i, j, k: (i, k, 0)  # noqa: E731
        f1_map = lambda i, j, k: (i, j, 0)  # noqa: E731
        out_map = lambda i, j, k: (i, k, j)  # noqa: E731
    return pl.pallas_call(
        _build_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_p, c), f0_map, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bm, c), f1_map, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, block_p, bm), out_map, memory_space=pltpu.VMEM),
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


def _build_reference_u(f0, f1b, out_dtype, pp, unit_rows=TILE**2):
    """jnp twin of the unit-major build: [B, nUnits, Ppad, unit_rows]."""
    b, p, _ = f0.shape
    tt = unit_rows
    nu = f1b.shape[1] // tt
    v = _build_reference(f0, f1b, out_dtype)  # [B, P, M]
    v = _pad_rows(v, pp)
    return v.reshape(b, pp, nu, tt).transpose(0, 2, 1, 3)


@functools.lru_cache(maxsize=None)
def _build_with_vjp(out_dtype, block_p, grid_order="mp", umajor=False):
    @jax.custom_vjp
    def f(f0, f1b):
        return _build_volume_impl(f0, f1b, out_dtype=out_dtype, block_p=block_p,
                                  grid_order=grid_order, umajor=umajor)

    def fwd(f0, f1b):
        return f(f0, f1b), (f0, f1b)

    def bwd(res, g):
        f0, f1b = res
        p = f0.shape[1]
        if umajor:
            b = f0.shape[0]
            tt = TILE**2
            g2 = g.transpose(0, 2, 1, 3).reshape(b, g.shape[2], -1)[:, :p]
            _, vjp = jax.vjp(lambda a, c: _build_reference(a, c, out_dtype), f0, f1b)
            return vjp(g2.astype(out_dtype))
        _, vjp = jax.vjp(lambda a, c: _build_reference(a, c, out_dtype), f0, f1b)
        return vjp(g[:, :p].astype(out_dtype))

    f.defvjp(fwd, bwd)
    return f


def build_volume(f0: jnp.ndarray, f1b: jnp.ndarray, out_dtype=jnp.bfloat16,
                 block_p: int = 512, interpret: bool = False,
                 umajor: bool = False) -> jnp.ndarray:
    """All-pairs correlation volume, unscaled, in out_dtype.

    f0: [B, P, C] query features; f1b: [B, M, C] pre-blocked (tiled-unit
    layout) target features. Layouts: p-major (default) [B, Ppad, M], or
    umajor=True [B, M/TILE^2 units, Ppad, TILE^2] — the unit-major form is
    bitcast-identical to the [B*nUnits*Ppad, TILE^2] row-gather view the
    lookup consumes, so no relayout copy sits between build and gather
    (round-5 profiler: that copy cost 5.6 ms/fwd at the flagship shape).
    Rows >= P of the pixel axis are padding garbage — callers index p < P
    only. Values match the jnp einsum with preferred_element_type=out_dtype
    (single f32->out_dtype rounding).
    """
    pp = -(-f0.shape[1] // block_p) * block_p
    if interpret:
        return _build_volume_impl(f0, f1b, out_dtype=out_dtype, block_p=block_p,
                                  interpret=True, umajor=umajor)
    if jax.default_backend() == "cpu":
        if umajor:
            return _build_reference_u(f0, f1b, out_dtype, pp)
        return _build_reference(f0, f1b, out_dtype)
    # UNIMATCH_VOLUME_BUILD=xla uses the plain einsum (A/B lever: 9.3 vs
    # 11.4 ms isolated this round, but the einsum form measured a bimodal
    # ~85 ms in round 2 — the Pallas build's reliability wins the default)
    if os.environ.get("UNIMATCH_VOLUME_BUILD", "pallas") == "xla":
        if umajor:
            return _build_reference_u(f0, f1b, out_dtype, pp)
        return _build_reference(f0, f1b, out_dtype)
    # grid order + p-block are env-tunable A/B levers (read OUTSIDE the jitted
    # impl; see lookup_select_blend's note on env reads vs trace caches)
    grid_order = os.environ.get("UNIMATCH_VOLUME_GRID", "mp")
    block_p = int(os.environ.get("UNIMATCH_VOLUME_BP", block_p))
    return _build_with_vjp(out_dtype, block_p, grid_order, umajor)(f0, f1b)


def build_volume_quantized(f0: jnp.ndarray, f1b: jnp.ndarray,
                           inv_scales: jnp.ndarray, block_p: int = 512,
                           interpret: bool = False,
                           unit_rows: int = TILE**2) -> jnp.ndarray:
    """Unit-major int8 volume (UNIMATCH_VOLUME_INT8): values are
    rint(<f0_p, f1_m> * inv_scales[b, u]) with the per-unit Cauchy-Schwarz
    reciprocal — dequantize with 1/inv_scales. unit_rows=2*TILE^2 builds the
    y-paired volume (UNIMATCH_VOLUME_PAIR). Inference-only (no vjp)."""
    pp = -(-f0.shape[1] // block_p) * block_p
    if interpret:
        return _build_volume_q_impl(f0, f1b, inv_scales, block_p=block_p,
                                    interpret=True, unit_rows=unit_rows)
    if jax.default_backend() == "cpu":
        return _build_reference_q(f0, f1b, inv_scales, pp, unit_rows)
    return _build_volume_q_impl(f0, f1b, inv_scales, block_p=block_p,
                                unit_rows=unit_rows)


# ---------------------------------------------------------------------------
# lookup: gathered 2x2 units -> span assembly -> rem shift-select -> bilinear
# ---------------------------------------------------------------------------


def _shift_left(x: jnp.ndarray, s: int) -> jnp.ndarray:
    """Static left shift along lanes, zero-filled tail (wrap is never read)."""
    if s == 0:
        return x
    return jnp.concatenate([x[:, s:], jnp.zeros((x.shape[0], s), x.dtype)], axis=1)


def _var_shift_left(x: jnp.ndarray, val: jnp.ndarray, unit: int) -> jnp.ndarray:
    """Per-pixel left shift by unit*val lanes, val in [0, 16): 4 static shifts
    + per-pixel selects on the bits of val (Mosaic has no per-row rotate)."""
    for kbit in range(4):
        bit = 1 << kbit
        x = jnp.where((val & bit) != 0, _shift_left(x, unit * bit), x)
    return x


def _lookup_kernel(g_ref, sc_ref, o_ref, *, k: int, scale: float,
                   narrow: bool = False, dequant: bool = False):
    """Reshape-free select/blend on gathered 2x2 unit spans.

    Lane layout (Mosaic rejects in-kernel minor reshapes, so everything is
    expressed as lane slices/concats/shifts on 2-D [BP, lanes] tensors):
    the 4 gathered units arrive in LEFT-COLUMN-MAJOR order (top-left,
    bottom-left, top-right, bottom-right), each internally (row, col)
    row-major, so the 1024-lane concat holds the left half of the 32x32 span
    as rows 0..31 at lanes 16r+c in [0, 512) and the right half at
    [512, 1024). A single variable left-shift by 16*remy lane units aligns
    the y-window for BOTH halves simultaneously; the x-window alignment is a
    variable shift by remx for in-row columns plus a static +496 shifted copy
    that pulls columns that straddle into the right half; tap (dy, dx) then
    sits at lane 16*dy + dx and the 4 bilinear corners are static shifts of
    1 / 16 / 17 lanes.
    """
    kk = k + 1
    assert kk <= TILE
    dt = o_ref.dtype

    sc = sc_ref[...]  # [BP, 4] f32 (remy, remx, wx1, wy1); +nu dequant lanes
    # g_ref: [nu, BP, 1024/nu] — unit axis leading so each unit slice is a
    # clean 2-D block (Mosaic rejects lane-concat of middle-axis slices
    # whose layouts carry different sublane offsets). nu=4: plain units in
    # left-column-major order; nu=2: y-PAIRED units (UNIMATCH_VOLUME_PAIR),
    # each 512-lane row already holding [top|bottom] of one column — the
    # concat below produces the identical 1024-lane span either way.
    nu = g_ref.shape[0]
    if dequant:
        # int8 units: per-unit dequantization at span assembly (sc lanes
        # 4..4+nu carry this pixel's unit scales, gathered XLA-side via a
        # one-hot einsum over the tiny [nUnits] table)
        span = jnp.concatenate(
            [
                (g_ref[u].astype(jnp.float32) * sc[:, 4 + u : 5 + u]).astype(dt)
                for u in range(nu)
            ],
            axis=1,
        )  # [BP, 1024]
    else:
        span = jnp.concatenate(
            [g_ref[u] for u in range(nu)], axis=1
        ).astype(dt)  # [BP, 1024]
    remy = sc[:, 0:1].astype(jnp.int32)
    remx = sc[:, 1:2].astype(jnp.int32)

    # y-align: row (remy + dy) of both halves lands at lane 16*dy + c
    span = _var_shift_left(span, remy, TILE)
    if narrow:
        # only rows 0..kk-1 of each half are read from here on (kk <= 16
        # -> lanes < 256 of the left half, < 256 of the right half): slice
        # both halves to 256 lanes (128-aligned cuts) so the remaining 4
        # x-shift stages, the straddle copy, and the bilinear blend run on
        # 512 lanes instead of 1024 — the shift/select stages are the
        # kernel's VPU cost. The x-shift never pulls the (corrupted) seam
        # at lane 256-remx into a read lane: taps live at 16dy+dx <= 153.
        span = jnp.concatenate([span[:, :256], span[:, 512:768]], axis=1)
        straddle = 256 - TILE
    else:
        straddle = 512 - TILE
    # x-align: col (remx + dx) -> lane 16*dy + dx. In-row when
    # remx + dx < 16; straddling columns live in the right half at a static
    # offset (half-size - TILE) after the same remx shift.
    a = _var_shift_left(span, remx, 1)
    b = _shift_left(a, straddle)
    col = jax.lax.broadcasted_iota(jnp.int32, a.shape, 1) % TILE
    cp = jnp.where(col + remx < TILE, a, b)  # tap (dy,dx) at lane 16dy+dx

    c00 = cp
    c01 = _shift_left(cp, 1)
    c10 = _shift_left(cp, TILE)
    c11 = _shift_left(cp, TILE + 1)
    wx1 = sc[:, 2:3].astype(dt)
    wy1 = sc[:, 3:4].astype(dt)
    one = jnp.ones((), dt)
    corr = (
        c00 * (one - wy1) * (one - wx1)
        + c01 * (one - wy1) * wx1
        + c10 * wy1 * (one - wx1)
        + c11 * wy1 * wx1
    )
    corr = corr * jnp.asarray(scale, dt)
    lane = jax.lax.broadcasted_iota(jnp.int32, corr.shape, 1)
    valid = ((lane % TILE) < k) & (lane < k * TILE)
    o_ref[...] = jnp.where(valid, corr, jnp.zeros((), dt))[:, : o_ref.shape[1]]


@functools.partial(
    jax.jit,
    static_argnames=("k", "scale", "out_dtype", "block_p", "interpret", "narrow"),
)
def _lookup_impl(g, sc, k, scale, out_dtype, block_p=256, interpret=False,
                 narrow=False):
    n = g.shape[1]
    kk = k + 1
    # narrow requires the taps to fit the sliced 256-lane halves
    narrow = narrow and kk <= TILE
    dequant = sc.shape[1] >= 4 + g.shape[0]
    npad = -(-n // block_p) * block_p
    if npad != n:
        g = jnp.pad(g, ((0, 0), (0, npad - n), (0, 0)))
        sc = jnp.pad(sc, ((0, npad - n), (0, 0)))
    out = pl.pallas_call(
        functools.partial(_lookup_kernel, k=k, scale=scale, narrow=narrow,
                          dequant=dequant),
        grid=(npad // block_p,),
        in_specs=[
            pl.BlockSpec((g.shape[0], block_p, g.shape[2]), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((block_p, sc.shape[1]), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((block_p, kk * TILE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, kk * TILE), out_dtype),
        interpret=interpret,
    )(g, sc)
    return out[:n]


def _lookup_reference(g, sc, k, scale, out_dtype):
    """jnp twin of _lookup_kernel: same math and output layout, with the
    span/select expressed via the reshapes XLA supports natively."""
    kk = k + 1
    t = TILE
    n = g.shape[1]
    if g.shape[0] == 2:
        # y-paired units: split each [top|bottom] 512-lane row back into the
        # 4-unit left-column-major form and duplicate the pair scales
        tt = t * t
        g = jnp.stack([g[0, :, :tt], g[0, :, tt:], g[1, :, :tt], g[1, :, tt:]])
        if sc.shape[1] >= 6:
            sc = jnp.concatenate(
                [sc[:, :4], sc[:, 4:5], sc[:, 4:5], sc[:, 5:6], sc[:, 5:6]],
                axis=1,
            )
    if sc.shape[1] >= 8:  # int8 units + per-unit dequant lanes
        g = jnp.stack(
            [g[u].astype(jnp.float32) * sc[:, 4 + u : 5 + u] for u in range(4)]
        ).astype(out_dtype)
    # units arrive left-column-major on the leading axis: [top-left,
    # bottom-left, top-right, bottom-right], each (row, col) row-major
    left = jnp.stack([g[0], g[1]], axis=1).reshape(n, 2 * t, t)
    right = jnp.stack([g[2], g[3]], axis=1).reshape(n, 2 * t, t)
    span = jnp.concatenate([left, right], axis=2).astype(out_dtype)  # [N, 2t, 2t]
    remy = sc[:, 0:1]
    remx = sc[:, 1:2]
    zero = jnp.zeros((), out_dtype)
    cpr = sum(
        jnp.where((remy == a)[:, :, None], span[:, a : a + kk, :], zero) for a in range(t)
    )
    cp = sum(
        jnp.where((remx == b)[:, :, None], cpr[:, :, b : b + kk], zero) for b in range(t)
    )  # [N, kk, kk]
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
    corr = corr * jnp.asarray(scale, out_dtype)  # [N, k, k]
    # kernel output layout: tap (dy, dx) at lane TILE*dy + dx
    out = jnp.zeros((n, kk, t), out_dtype)
    out = out.at[:, :k, :k].set(corr)
    return out.reshape(n, kk * t)


@functools.lru_cache(maxsize=None)
def _lookup_with_vjp(k, scale, out_dtype, block_p, narrow=False):
    @jax.custom_vjp
    def f(g, sc):
        return _lookup_impl(g, sc, k, scale, out_dtype, block_p=block_p,
                            narrow=narrow)

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

    g: [4, N, 256] units for N pixels, unit axis leading, in
    LEFT-COLUMN-MAJOR order (top-left, bottom-left, top-right,
    bottom-right), each unit (row, col) row-major; sc: [N, 4] f32 packed
    per-pixel scalars (remy, remx, wx1, wy1). Returns [N, (k+1)*TILE] in
    out_dtype with window tap (dy, dx) at lane TILE*dy + dx (scale applied,
    unused lanes zero) — callers compact via
    reshape(..., k+1, TILE)[:, :k, :k].
    """
    # env read stays OUTSIDE the jitted impl: an env-dependent branch inside
    # a jitted function is baked into its trace cache, so later flag flips
    # would silently reuse the wrong variant. Default ON since round 4e:
    # flagship 57.5-57.7 vs 58.0-58.3 ms, isolated build+6 20.2 vs 21.1,
    # on-chip parity EXACT 0.0 (docs/PERF_NOTES.md).
    import os

    narrow = os.environ.get("UNIMATCH_LOOKUP_NARROW", "1") != "0"
    if interpret:
        return _lookup_impl(g, sc, k, scale, out_dtype, block_p=block_p,
                            interpret=True, narrow=narrow)
    if jax.default_backend() == "cpu":
        return _lookup_reference(g, sc, k, scale, out_dtype)
    return _lookup_with_vjp(k, scale, jnp.dtype(out_dtype), block_p, narrow)(g, sc)
