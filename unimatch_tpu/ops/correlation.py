"""Correlation / cost-volume matching ops with softmax-argmax readout (NHWC).

Functional parity targets in the reference (semantics, not code):
  global_correlation_softmax            unimatch/matching.py:7-36
  local_correlation_softmax             unimatch/matching.py:39-83
  local_correlation_with_flow           unimatch/matching.py:86-123
  global_correlation_softmax_stereo     unimatch/matching.py:126-151
  local_correlation_softmax_stereo      unimatch/matching.py:154-200
  correlation_softmax_depth             unimatch/matching.py:203-236
  warp_with_pose_depth_candidates       unimatch/matching.py:239-282

TPU-first design choices:
  * Local (windowed) correlation at *integer* offsets is a stack of static
    shifted reads (zero gathers) — a bilinear sample at integer coordinates
    reduces to a shift, so we never call grid_sample for it. The softmax
    expectation also simplifies: E[coords] - coords = E[offsets].
  * Global correlation is a batched [HW, C] x [C, HW] matmul on the MXU.
    This module holds the jnp reference implementation; a fused Pallas
    blockwise (flash-style) softmax-expectation kernel that never
    materializes the [HW, HW] volume in HBM lives in
    unimatch_tpu.kernels.corr_kernels and is dispatched when profitable.
  * Softmax always in fp32.
"""

from __future__ import annotations

from typing import Optional, Tuple

import os

import jax
import jax.numpy as jnp
import numpy as np

from unimatch_tpu.ops import geometry as G
from unimatch_tpu.ops.upsample import extract_patches


def _window_offsets(radius_y: int, radius_x: int) -> np.ndarray:
    """[(2ry+1)*(2rx+1), 2] integer (x, y) offsets, kernel row-major order."""
    dy, dx = np.meshgrid(
        np.arange(-radius_y, radius_y + 1), np.arange(-radius_x, radius_x + 1), indexing="ij"
    )
    return np.stack([dx.reshape(-1), dy.reshape(-1)], axis=-1).astype(np.float32)


def global_correlation_softmax(
    feature0: jnp.ndarray, feature1: jnp.ndarray, pred_bidir_flow: bool = False
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Global 2D matching. features: [B, H, W, C] -> flow [B(,2B), H, W, 2].

    Reference matching.py:7-36. Bidirectional flow reuses the same correlation
    transposed, stacking fwd/bwd on the batch axis.
    """
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)
    grid = G.coords_grid(h, w).reshape(h * w, 2)  # [HW, 2]

    from unimatch_tpu.parallel.context import sp_applicable

    sp = sp_applicable(h * w)
    if sp is not None:
        # sequence-parallel: query tokens sharded over the mesh axis; the
        # per-device block runs the same fused kernel as the one-chip path
        from unimatch_tpu.parallel.sequence_parallel import sp_attention_expectation

        mesh, axis = sp
        gv = jnp.broadcast_to(grid[None], (b, h * w, 2)).astype(f0.dtype)
        corresp = sp_attention_expectation(mesh, f0, f1, gv, axis=axis)
        if pred_bidir_flow:
            corresp = jnp.concatenate(
                [corresp, sp_attention_expectation(mesh, f1, f0, gv, axis=axis)], axis=0
            )
            b = 2 * b
        flow = corresp.reshape(b, h, w, 2) - grid.reshape(h, w, 2)[None]
        return flow.astype(feature0.dtype), None

    from unimatch_tpu.kernels import use_pallas

    if use_pallas():
        # fused Pallas path: softmax-expectation without materializing the
        # [HW, HW] volume in HBM. Bidirectional flow = the same kernel with
        # swapped query/key (softmax of corr^T == matching image1 -> image0).
        from unimatch_tpu.kernels.attention_expectation import attention_expectation

        gv = jnp.broadcast_to(grid[None], (b, h * w, 2)).astype(f0.dtype)
        corresp = attention_expectation(f0, f1, gv)
        if pred_bidir_flow:
            corresp = jnp.concatenate([corresp, attention_expectation(f1, f0, gv)], axis=0)
            b = 2 * b
        flow = corresp.reshape(b, h, w, 2) - grid.reshape(h, w, 2)[None]
        return flow.astype(feature0.dtype), None

    corr = jnp.einsum("blc,bmc->blm", f0, f1, preferred_element_type=jnp.float32)
    corr = corr / jnp.sqrt(jnp.float32(c))  # [B, HW, HW]

    if pred_bidir_flow:
        corr = jnp.concatenate([corr, jnp.swapaxes(corr, 1, 2)], axis=0)  # [2B, HW, HW]
        b = 2 * b

    prob = jax.nn.softmax(corr, axis=-1)  # fp32 [B, HW, HW]
    correspondence = jnp.einsum("blm,mx->blx", prob, grid)  # [B, HW, 2]
    flow = correspondence.reshape(b, h, w, 2) - grid.reshape(h, w, 2)[None]
    return flow.astype(feature0.dtype), prob


def local_correlation_softmax(
    feature0: jnp.ndarray, feature1: jnp.ndarray, local_radius: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Windowed matching at integer offsets — static shifted reads, no gather.

    features: [B, H, W, C] -> flow [B, H, W, 2], prob [B, H, W, (2R+1)^2].
    Reference matching.py:39-83 (which uses grid_sample; integer offsets make
    that equivalent to zero-padded shifts).
    """
    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 1

    patches = extract_patches(feature1, k, r)  # [B, H, W, k*k, C] zero-padded
    corr = jnp.einsum(
        "bhwnc,bhwc->bhwn", patches, feature0, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(c))

    offsets = _window_offsets(r, r)  # [(k*k), 2] (x, y)
    # validity of sample position (pixel + offset) inside the image
    grid = G.coords_grid(h, w)  # [H, W, 2]
    sample = grid[:, :, None, :] + offsets[None, None]  # [H, W, k*k, 2]
    valid = (
        (sample[..., 0] >= 0) & (sample[..., 0] < w) & (sample[..., 1] >= 0) & (sample[..., 1] < h)
    )
    corr = jnp.where(valid[None], corr, -1e9)

    prob = jax.nn.softmax(corr, axis=-1)  # fp32
    # E[coords] - coords = E[offsets]
    flow = jnp.einsum("bhwn,nx->bhwx", prob, jnp.asarray(offsets))
    return flow.astype(feature0.dtype), prob


def local_correlation_softmax_flow(
    feature0: jnp.ndarray, feature1: jnp.ndarray, local_radius: int
) -> jnp.ndarray:
    """Flow-only local matching — what the model actually consumes
    (models/unimatch.py discards the prob output). Dispatches to the fused
    streaming-softmax kernel (kernels/local_corr.py) on TPU: the XLA form's
    extract_patches materializes [B, H, W, K*K, C] (~594 MB at the flagship
    scale-1 shape) for a 4.6 MB result. Default ON since round 4e: flagship
    forward 56.6-56.8 vs 58.0-58.3 ms (interleaved), isolated 1.85 vs
    3.36 ms, on-chip parity 0.0065 on 2.73 absmax (docs/PERF_NOTES.md).
    UNIMATCH_FUSE_LOCAL_CORR=0 re-traces the XLA form for A/B."""
    if os.environ.get("UNIMATCH_FUSE_LOCAL_CORR", "1") != "0":
        from unimatch_tpu.kernels import use_pallas

        if use_pallas():
            from unimatch_tpu.kernels.local_corr import local_corr_softmax_flow

            return local_corr_softmax_flow(
                feature0, feature1, local_radius
            ).astype(feature0.dtype)
    return local_correlation_softmax(feature0, feature1, local_radius)[0]


def local_correlation_with_flow(
    feature0: jnp.ndarray,
    feature1: jnp.ndarray,
    flow: jnp.ndarray,
    local_radius: int,
    dilation: int = 1,
    _sp_dispatch: bool = True,
    _row_offset=0,
) -> jnp.ndarray:
    """Flow-shifted window correlation for refinement.

    features: [B, H, W, C], flow [B, H, W, 2] -> corr [B, H, W, (2R+1)^2].
    Reference matching.py:86-123.

    TPU-optimized exact reformulation (measured 3-7x faster than the naive
    4-corner gather on v5e, and 2.2x again over the round-1 einsum form):
      * the 4 bilinear corners x (2R+1)^2 integer offsets visit only a
        (2R+2)^2 *unique* footprint per pixel — gather it once;
      * gather Q=4 adjacent columns per row (zero-padded f1 viewed as
        [.., W/Q, Q*C]) so each HBM gather transaction moves a 1 KB row
        instead of a 256 B row, then select the wanted kk columns
        branchlessly after the channel reduction;
      * channel-reduce IN THE GATHER'S NATIVE LAYOUT: multiply by per-pixel
        f0 (tiled to Q*C) and contract with a [Q*C, Q] block indicator on
        the MXU. The round-1 einsum form forced an f32 cast + layout-copy
        reshape of the [B,H,W,kk,nqQ,C] megatensor (2.3 GB at bench shape,
        ~10 ms/iter of pure HBM traffic — profiled);
      * 1-D flat gather indices (an [N,1] index array gets a T(1,128) lane-
        padded layout: 128x the bytes, ~3.6 ms/iter of copies — profiled);
      * realize the bilinear blend as 4 static shifted slices of the
        channel-reduced [.., kk, kk] patch.
    """
    import math

    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 1
    kk = k + 1  # unique footprint side
    q = int(os.environ.get("UNIMATCH_CORR_Q", "4"))  # column-group width (gather widening)
    nq = math.ceil(kk / q) + 1
    assert dilation == 1, "dilation > 1 uses the generic sampling path"

    if _sp_dispatch:
        from unimatch_tpu.parallel.context import sp_applicable

        sp = sp_applicable(h)  # queries/flow are row-separable: shard H
        if sp is not None:
            from unimatch_tpu.parallel.sequence_parallel import sp_local_correlation_with_flow

            mesh, axis = sp
            return sp_local_correlation_with_flow(
                mesh, feature0, feature1, flow, local_radius, axis=axis
            )

    # _row_offset: feature0/flow may be a row-block of a larger map (sequence
    # parallelism) — queries live at global rows [offset, offset + h) of
    # feature1, whose own height h1 governs the gather layout
    h1 = feature1.shape[1]
    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0) + _row_offset
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs[None] + flow[..., 0].astype(jnp.float32)
    fy = ys[None] + flow[..., 1].astype(jnp.float32)
    bx = jnp.floor(fx)
    by = jnp.floor(fy)
    wx1 = (fx - bx)[..., None, None]
    wy1 = (fy - by)[..., None, None]

    # zero padding implements the reference's grid_sample zeros semantics:
    # when the clamped slice start parks a fully-out-of-image footprint in
    # the pad region, every tap reads 0 (same contribution as masked taps)
    pad = kk + q
    wp = -(-(w + 2 * pad) // q) * q + q
    f1p = jnp.pad(feature1, ((0, 0), (pad, pad), (pad, wp - w - pad), (0, 0)))
    hp = h1 + 2 * pad

    iy0 = jnp.clip(by - r + pad, 0, hp - kk).astype(jnp.int32)
    ix0 = jnp.clip(bx - r + pad, 0, w + 2 * pad - kk).astype(jnp.int32)
    qs = ix0 // q  # column-group index
    rem = ix0 - qs * q  # 0..q-1

    wq = f1p.shape[2] // q
    flat = f1p.reshape(b * hp * wq, q * c)
    dyo = jnp.arange(kk, dtype=jnp.int32)
    gq = jnp.arange(nq, dtype=jnp.int32)
    idx = (
        (iy0[..., None, None] + dyo[None, None, None, :, None]) * wq
        + qs[..., None, None]
        + gq[None, None, None, None, :]
    )  # [B, H, W, kk, nq]
    if b > 1:
        idx = idx + (jnp.arange(b, dtype=jnp.int32) * hp * wq)[:, None, None, None, None]
    g = jnp.take(flat, idx.reshape(-1), axis=0)  # [B*H*W*kk*nq, q*c]

    # channel reduction in native layout: (g * f0_tiled) @ block-indicator.
    # Two equivalent formulations (identical values; see PERF_NOTES):
    #   flat: 2-D dot on [N, q*c] with an explicitly broadcast f0, f32 out +
    #         cast (the round-1 form)
    #   4d:   batched dot with f0 broadcast inside the fusion and the output
    #         rounded once via preferred_element_type (MXU still accumulates
    #         f32; fp32 eval keeps full precision)
    ctype = feature0.dtype
    sel = jnp.repeat(jnp.eye(q, dtype=g.dtype), c, axis=0)  # [q*c, q]
    f0t = jnp.tile(feature0.reshape(b, h * w, 1, c), (1, 1, 1, q))  # [B, HW, 1, q*c]
    # interleaved same-session A/B: flat 13.6 ms vs 4d 28.5 ms per iteration
    # at bench shape (full forward 103 vs 119 ms) — the batched 4-D dot
    # lowers poorly; flat stays the default
    if os.environ.get("UNIMATCH_CORR_REDUCE", "flat") == "flat":
        f0b = jnp.broadcast_to(f0t, (b, h * w, kk * nq, q * c)).reshape(-1, q * c)
        red = jax.lax.dot_general(
            (g * f0b), sel, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        )
        cp_all = red.astype(ctype).reshape(b, h, w, kk, nq * q)
    else:
        g4 = g.reshape(b, h * w, kk * nq, q * c)
        red = jax.lax.dot_general(
            g4 * f0t, sel, (((3,), (0,)), ((), ())), preferred_element_type=ctype
        )  # [B, HW, kk*nq, q]
        cp_all = red.reshape(b, h, w, kk, nq * q)

    # branchless selection of the kk columns starting at rem
    rem_b = rem[..., None, None]
    zero = jnp.zeros((), ctype)
    cp = sum(jnp.where(rem_b == j, cp_all[..., j : j + kk], zero) for j in range(q))

    c00 = cp[..., 0:k, 0:k]
    c01 = cp[..., 0:k, 1 : k + 1]
    c10 = cp[..., 1 : k + 1, 0:k]
    c11 = cp[..., 1 : k + 1, 1 : k + 1]
    wx1 = wx1.astype(ctype)
    wy1 = wy1.astype(ctype)
    one = jnp.ones((), ctype)
    corr = (
        c00 * (one - wy1) * (one - wx1)
        + c01 * (one - wy1) * wx1
        + c10 * wy1 * (one - wx1)
        + c11 * wy1 * wx1
    )
    corr = corr.reshape(b, h, w, k * k) * jnp.asarray(1.0 / (c**0.5), ctype)
    return corr.astype(feature0.dtype)  # [B, H, W, (2R+1)^2]


class TiledVolume:
    """Precomputed all-pairs correlation volume in a gather-friendly layout.

    vt: [B, Ppad, nUnits, T*T] in the COMPACT tiled layout: unit u < nrc*ngc
    with u = rr*ngc + gg holds the T x T block of correlations against
    feature1 rows [T*rr, T*rr+T) and cols [T*gg, T*gg+T) in *image*
    coordinates (high-side zero fill to tile multiples); unit nrc*ngc is a
    shared all-zero sentinel that every lookup outside the image remaps to,
    so the zero ring the clamping math assumes (a tile-aligned pad of T on
    every side) is never computed or stored — at the flagship bench shape
    that ring was 31% of the volume's HBM write traffic. Units beyond the
    sentinel (rounding nUnits up to a multiple of 8 for a wide build block)
    are zero and never referenced. Each unit is contiguous (T*T = 256
    elements = 512 B in bf16), tuned to this TPU's measured gather cost
    curve: 256 B-1 KB gather rows run ~13x cheaper per row than 32 B rows,
    so a window lookup is 4 unit-gathers per pixel rather than 100 scattered
    scalars (the failure mode of the flat RAFT-style volume). Ppad >= H*W
    (Pallas build pads the pixel axis; rows >= H*W are unused).
    """

    def __init__(self, vt, h, w, hp, wp, pad, tile, scale, ppad, nrc, ngc,
                 umajor=False, dequant=None, paired=False):
        self.vt = vt
        self.h, self.w = h, w
        self.hp, self.wp = hp, wp
        self.pad = pad
        self.tile = tile
        self.scale = scale  # 1/sqrt(C)
        self.ppad = ppad
        self.nrc, self.ngc = nrc, ngc  # core (image-covering) tile grid
        # unit-major layout [B, nUnits, Ppad, T*T]: the row-gather view is a
        # no-op bitcast of the build kernel's output (p-major pays a 1.76 GB
        # relayout copy, 5.6 ms/fwd at the flagship shape — round-5 trace)
        self.umajor = umajor
        # int8 volume (UNIMATCH_VOLUME_INT8): [B, nUnits] f32 per-unit
        # dequantization factors (None -> bf16 volume)
        self.dequant = dequant
        # y-paired units (UNIMATCH_VOLUME_PAIR, int8 only): vt is
        # [B, nPairs, Ppad, 2*T*T] where pair q = a*ngc + gg holds
        # [tile(a-1, gg) | tile(a, gg)] over compact tile rows a-1, a in
        # [-1, nrc] (out-of-core halves zero) — the lookup then needs 2 row
        # gathers per pixel instead of 4 (the gather is TRANSACTION-limited:
        # halving bytes via int8 didn't move it, round-5i profile)
        self.paired = paired


_VOL_TILE = 16


def tiled_volume_fits(b: int, h: int, w: int, local_radius: int,
                      itemsize: int = 2, budget_bytes: int = int(2.6e9)) -> bool:
    """Whether the compact tiled refine-lookup volume fits the memory budget."""
    t = _VOL_TILE
    n_units = (-(-h // t)) * (-(-w // t)) + 1  # core tiles + zero sentinel
    n_units = -(-n_units // 8) * 8
    return b * h * w * n_units * t * t * itemsize <= budget_bytes


def build_tiled_correlation_volume(
    feature0: jnp.ndarray, feature1: jnp.ndarray, local_radius: int
) -> TiledVolume:
    """One MXU matmul producing the volume *already in tiled unit layout*.

    The refine loop's flow-shifted window correlation re-gathers ~25 KB of
    feature rows per pixel per iteration (the footprint is 100x the output);
    since feature0/feature1 are fixed across all num_reg_refine iterations,
    precomputing correlations amortizes that traffic: per iteration the lookup
    touches ~1 KB per pixel. The T-blocked layout is obtained for free by
    pre-blocking feature1's spatial axes before the dot — no transpose pass —
    and the matmul rounds its f32 accumulation once to the storage dtype (the
    same rounding the direct path applies to its channel reduction). On TPU
    the matmul runs as a Pallas kernel (kernels/corr_volume.py): the plain
    XLA einsum measured ~27 GB/s effective output bandwidth at this
    K=128-thin shape (docs/PERF_NOTES.md). Matches the zero-padding
    semantics of local_correlation_with_flow (padded rows/cols correlate
    against zeros).
    """
    b, h, w, c = feature0.shape
    t = _VOL_TILE
    kk = 2 * local_radius + 2
    assert kk <= t, "window must fit a 2x2 unit span"
    # Tile-aligned zero ring: pad = T (>= kk, so the footprint-start clamps
    # park fully-OOB windows in zeros) makes every ring tile PURE zero, so
    # only the core (image-covering) tiles are built and stored; ring
    # lookups remap to a single shared zero sentinel unit. At the flagship
    # bench shape this removes 31% of the build's HBM write traffic
    # (162 -> 113 units per pixel).
    pad = t
    hp = -(-(h + 2 * pad) // t) * t
    wp = -(-(w + 2 * pad) // t) * t
    nrc, ngc = -(-h // t), -(-w // t)
    n_units = nrc * ngc + 1  # + zero sentinel
    n_units = -(-n_units // 8) * 8  # wide M block for the build kernel

    f1c = jnp.pad(feature1, ((0, 0), (0, nrc * t - h), (0, ngc * t - w), (0, 0)))
    # [B, nrc, T, ngc, T, C] -> [B, nrc, ngc, T, T, C] -> [B, units*T*T, C]
    f1b = f1c.reshape(b, nrc, t, ngc, t, c).transpose(0, 1, 3, 2, 4, 5).reshape(
        b, nrc * ngc * t * t, c
    )
    # sentinel + rounding units: zero feature rows -> zero correlations
    f1b = jnp.pad(f1b, ((0, 0), (0, (n_units - nrc * ngc) * t * t), (0, 0)))

    f0 = feature0.reshape(b, h * w, c)
    from unimatch_tpu.kernels.corr_volume import build_volume

    # unit-major layout (UNIMATCH_VOLUME_UMAJOR, round-5, default ON): the
    # build writes [B, nUnits, Ppad, T*T] directly, whose flattened
    # row-gather view is a no-op bitcast — the p-major form pays a 1.76 GB
    # physical relayout copy between build and gather (5.6 ms/fwd, round-5
    # profiler trace; in-situ −5.0 ms, exact parity — PERF_NOTES round-5c)
    umajor = os.environ.get("UNIMATCH_VOLUME_UMAJOR", "1") != "0"
    # int8 default ON since round-5h: flagship 40.1 vs 41.6 ms in situ, the
    # 3x-A100 clincher. Error is bounded (<= 0.5 quantization step per value,
    # tests/test_pallas_kernels.py::test_corr_volume_build_quantized*) and the
    # refine lookup's argmax is >95% stable; UNIMATCH_VOLUME_INT8=0 restores
    # the bf16 volume bit-for-bit. Inference-only (training keeps the direct
    # gather path — models/unimatch.py refine dispatch).
    if umajor and os.environ.get("UNIMATCH_VOLUME_INT8", "1") != "0":
        # int8 volume (round 5): per-unit Cauchy-Schwarz quantization —
        # inv[u] = 127 / (max_p ||f0_p|| * max_{m in u} ||f1_m||) bounds
        # every correlation the unit can hold, so rint() never clips.
        # Halves the volume write + the lookup's gather/read bytes at a
        # <=0.8%-of-unit-max quantization error on the refine corr input.
        from unimatch_tpu.kernels.corr_volume import build_volume_quantized

        n0 = jnp.max(jnp.linalg.norm(f0.astype(jnp.float32), axis=-1),
                     axis=-1, keepdims=True)  # [B, 1]
        if os.environ.get("UNIMATCH_VOLUME_PAIR", "1") != "0":
            # y-paired units (default ON since round-5j: flagship 38.9-39.3
            # vs 39.9-40.6 ms, stereo 35.1 vs 35.8-36.1 — every interleaved
            # rep wins): each stored unit is a vertical tile PAIR
            # [tile(a-1, gg) | tile(a, gg)] over compact rows a-1, a in
            # [-1, nrc] (halves outside the core are zero), so a window
            # lookup gathers 2 x 512 B rows instead of 4 x 256 B. The 4-row
            # gather is transaction-limited (halving its bytes via int8
            # changed nothing, r5i profile: 27.89 vs 27.97 ms), so halving
            # the ROW COUNT is the remaining lever; it costs a 2x volume
            # build (each tile is written twice). Int8-only;
            # UNIMATCH_VOLUME_PAIR=0 restores plain units.
            tiles = f1b[:, : nrc * ngc * t * t].reshape(b, nrc, ngc, t * t, c)
            zrow = jnp.zeros((b, 1, ngc, t * t, c), f1b.dtype)
            pairs = jnp.concatenate(
                [
                    jnp.concatenate([zrow, tiles], axis=1),  # tile(a-1)
                    jnp.concatenate([tiles, zrow], axis=1),  # tile(a)
                ],
                axis=3,
            )  # [B, nrc+1, ngc, 2*t*t, C]
            npc = (nrc + 1) * ngc
            npairs = -(-(npc + 1) // 8) * 8  # + zero sentinel, build-rounded
            f1p = pairs.reshape(b, npc * 2 * t * t, c)
            f1p = jnp.pad(
                f1p, ((0, 0), (0, (npairs - npc) * 2 * t * t), (0, 0)))
            n1 = jnp.linalg.norm(f1p.astype(jnp.float32), axis=-1)
            n1u = jnp.max(n1.reshape(b, npairs, 2 * t * t), axis=-1)
            bound = n0 * n1u
            inv = jnp.where(bound > 0, 127.0 / bound, 0.0).astype(jnp.float32)
            vt = build_volume_quantized(f0, f1p, inv, unit_rows=2 * t * t)
            return TiledVolume(vt, h, w, hp, wp, pad, t, 1.0 / (c**0.5),
                               vt.shape[2], nrc, ngc, umajor=True,
                               dequant=(bound / 127.0).astype(jnp.float32),
                               paired=True)
        n1 = jnp.linalg.norm(f1b.astype(jnp.float32), axis=-1)  # [B, M]
        n1u = jnp.max(n1.reshape(b, n_units, t * t), axis=-1)  # [B, nU]
        bound = n0 * n1u
        inv = jnp.where(bound > 0, 127.0 / bound, 0.0).astype(jnp.float32)
        vt = build_volume_quantized(f0, f1b, inv)
        return TiledVolume(vt, h, w, hp, wp, pad, t, 1.0 / (c**0.5),
                           vt.shape[2], nrc, ngc, umajor=True,
                           dequant=(bound / 127.0).astype(jnp.float32))
    vt = build_volume(f0, f1b, out_dtype=feature0.dtype, umajor=umajor)
    if umajor:
        ppad = vt.shape[2]  # [B, nUnits, Ppad, T*T]
    else:
        ppad = vt.shape[1]
        vt = vt.reshape(b, ppad, n_units, t * t)
    return TiledVolume(vt, h, w, hp, wp, pad, t, 1.0 / (c**0.5), ppad, nrc, ngc,
                       umajor=umajor)


def local_correlation_with_flow_from_tiled_volume(
    vol: TiledVolume, flow: jnp.ndarray, local_radius: int
) -> jnp.ndarray:
    """Window lookup into a TiledVolume — same values as
    local_correlation_with_flow (both paths round the f32 dot to the compute
    dtype before the bilinear blend). flow: [B, H, W, 2] -> [B, H, W, (2R+1)^2].

    The unit gather (4 contiguous 512 B units per pixel, pixel-local indices)
    runs as an XLA row gather; the span assembly + branchless rem selection +
    bilinear blend run as a Pallas kernel on TPU so the [*, 10, 32]
    select intermediates never touch HBM (kernels/corr_volume.py — the pure
    XLA form of those selects measured ~25 ms/iteration at bench shape).
    """
    b = vol.vt.shape[0]
    h, w, hp, wp, pad, t = vol.h, vol.w, vol.hp, vol.wp, vol.pad, vol.tile
    r = local_radius
    k = 2 * r + 1
    kk = k + 1
    nrc, ngc = vol.nrc, vol.ngc
    n_units = vol.vt.shape[1] if vol.umajor else vol.vt.shape[2]
    sentinel = nrc * ngc  # the shared all-zero unit

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs[None] + flow[..., 0].astype(jnp.float32)
    fy = ys[None] + flow[..., 1].astype(jnp.float32)
    bx = jnp.floor(fx)
    by = jnp.floor(fy)

    # identical clamping to the direct path (zero-padded image coordinates,
    # pad-wide tile-aligned ring on every side)
    iy0 = jnp.clip(by - r + pad, 0, hp - kk).astype(jnp.int32)
    ix0 = jnp.clip(bx - r + pad, 0, wp - kk).astype(jnp.int32)
    r0 = iy0 // t
    g0 = ix0 // t
    remy = iy0 - r0 * t
    remx = ix0 - g0 * t

    # gather the 2x2 units covering rem + kk along each axis, in the
    # left-column-major order the lookup kernel's lane layout expects:
    # (top-left, bottom-left, top-right, bottom-right). Unit coords are in
    # the padded grid; subtracting the one-tile ring maps to the compact
    # core grid, and anything outside it reads the zero sentinel.
    iu = jnp.arange(2, dtype=jnp.int32)
    pix = (
        jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 1) * w
        + jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 2)
    )
    bi = jax.lax.broadcasted_iota(jnp.int32, (b, h, w), 0)
    if vol.paired:
        # y-paired volume: one gather per x-column fetches the whole
        # [top|bottom] 512 B pair row. Pair q = a*ngc + gg covers compact
        # tile rows (a-1, a); the window's top tile is compact r0-1, so
        # a = r0 (the PADDED tile-row start) directly.
        flat = vol.vt.reshape(b * vol.ppad * n_units, 2 * t * t)
        sentinel_p = (nrc + 1) * ngc
        gu = g0[None] + iu[:, None, None, None] - 1  # [2, B, H, W]
        a = r0[None]
        in_core = (a <= nrc) & (gu >= 0) & (gu < ngc)
        unit = jnp.where(in_core, a * ngc + gu, sentinel_p)  # [2, B, H, W]
        base = bi * (n_units * vol.ppad) + pix
        idx = base[None] + unit * vol.ppad
        g = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(
            2, b * h * w, 2 * t * t)
    else:
        flat = vol.vt.reshape(b * vol.ppad * n_units, t * t)
        ru = r0[None, None] + iu[None, :, None, None, None] - 1  # [1, 2, B, H, W]
        gu = g0[None, None] + iu[:, None, None, None, None] - 1  # [2, 1, B, H, W]
        in_core = (ru >= 0) & (ru < nrc) & (gu >= 0) & (gu < ngc)
        unit = jnp.where(in_core, ru * ngc + gu, sentinel)  # [2, 2, B, H, W]
        if vol.umajor:
            # [B, nUnits, Ppad, T*T] flattened: row = (b*nUnits + u)*Ppad + p
            base = bi * (n_units * vol.ppad) + pix
            idx = base[None, None] + unit * vol.ppad
        else:
            base = bi * (vol.ppad * n_units) + pix * n_units
            idx = base[None, None] + unit  # [2 (x-unit), 2 (y-unit), B, H, W]
        # mode="clip": idx is in-bounds by construction (sentinel remap
        # above), and the default fill mode materializes a select_n over the
        # full [4*H*W, T*T] gather output — 0.54 ms/fwd of pure waste at the
        # flagship shape (round-5h profile, broadcast_select_fusion.16)
        g = jnp.take(flat, idx.reshape(-1), axis=0, mode="clip").reshape(
            4, b * h * w, t * t)

    ctype = flow.dtype if flow.dtype != jnp.float64 else jnp.float32
    lanes = [
        remy.astype(jnp.float32).reshape(-1),
        remx.astype(jnp.float32).reshape(-1),
        (fx - bx).reshape(-1),
        (fy - by).reshape(-1),
    ]
    if vol.dequant is not None:
        # per-pixel dequant factors for the gathered units: a one-hot
        # einsum over the tiny [B, nUnits] table (fused iota-compare-reduce
        # pass; per-element jnp.take here would be a catastrophic scalar
        # gather — the round-2 lesson)
        ng = g.shape[0]  # 4 plain units, or 2 y-pairs
        uid = unit.reshape(ng, b, h * w)  # same order as g's leading axis
        onehot = uid[..., None] == jnp.arange(n_units, dtype=jnp.int32)
        dq = jnp.einsum(
            "ubpn,bn->ubp", onehot.astype(jnp.float32), vol.dequant
        ).reshape(ng, -1)
        lanes += [dq[u] for u in range(ng)]
    sc = jnp.stack(lanes, axis=-1)  # [B*H*W, 4 (bf16) / 6 (paired) / 8 (int8)]

    from unimatch_tpu.kernels.corr_volume import lookup_select_blend

    out = lookup_select_blend(g, sc, k, vol.scale, ctype)  # [N, kk*TILE]
    corr = out.reshape(b, h, w, kk, t)[..., :k, :k].reshape(b, h, w, k * k)
    return corr.astype(flow.dtype)


def build_full_correlation_volume(feature0: jnp.ndarray, feature1: jnp.ndarray) -> jnp.ndarray:
    """All-pairs correlation volume [B, HW, HW] (scaled by 1/sqrt(C)), bf16.

    RAFT-style trade for the regression-refinement loop: one MXU matmul up
    front, then each refine iteration looks up *scalars* from the volume
    (~70x less gather traffic than re-gathering feature rows per iteration).
    Only used when the volume fits a memory budget — see
    local_correlation_with_flow_from_volume.
    """
    b, h, w, c = feature0.shape
    f0 = feature0.reshape(b, h * w, c)
    f1 = feature1.reshape(b, h * w, c)
    corr = jnp.einsum("blc,bmc->blm", f0, f1, preferred_element_type=jnp.float32)
    return (corr / jnp.sqrt(jnp.float32(c))).astype(jnp.bfloat16)


def volume_fits_budget(b: int, h: int, w: int, budget_bytes: int = int(2.5e9)) -> bool:
    return 2 * b * (h * w) ** 2 <= budget_bytes


def local_correlation_with_flow_from_volume(
    volume: jnp.ndarray,  # [B, HW, HW] from build_full_correlation_volume
    flow: jnp.ndarray,  # [B, H, W, 2]
    h: int,
    w: int,
    local_radius: int,
) -> jnp.ndarray:
    """Window lookup into a precomputed volume — exact same values as
    local_correlation_with_flow (up to volume dtype)."""
    b = volume.shape[0]
    r = local_radius
    k = 2 * r + 1
    kk = k + 1

    ys = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    xs = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    fx = xs[None] + flow[..., 0].astype(jnp.float32)
    fy = ys[None] + flow[..., 1].astype(jnp.float32)
    bx = jnp.floor(fx)
    by = jnp.floor(fy)
    wx1 = (fx - bx)[..., None, None]
    wy1 = (fy - by)[..., None, None]

    off = jnp.arange(-r, r + 2, dtype=jnp.float32)  # [kk]
    iy = by[..., None] + off
    ix = bx[..., None] + off
    valid = ((iy[..., :, None] >= 0) & (iy[..., :, None] <= h - 1)
             & (ix[..., None, :] >= 0) & (ix[..., None, :] <= w - 1))  # [B,H,W,kk,kk]
    iyc = jnp.clip(iy, 0, h - 1).astype(jnp.int32)
    ixc = jnp.clip(ix, 0, w - 1).astype(jnp.int32)
    idx = (iyc[..., :, None] * w + ixc[..., None, :]).reshape(b, h * w, kk * kk)

    g = jnp.take_along_axis(volume, idx, axis=2)  # [B, HW, kk*kk] scalars
    cp = jnp.where(valid.reshape(b, h * w, kk * kk), g.astype(jnp.float32), 0.0)
    cp = cp.reshape(b, h, w, kk, kk)

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
    return corr.reshape(b, h, w, k * k).astype(flow.dtype)


def global_correlation_softmax_stereo(
    feature0: jnp.ndarray, feature1: jnp.ndarray
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Per-scanline global matching with positive-disparity (lower-tri) mask.

    features: [B, H, W, C] -> disparity [B, H, W, 1], prob [B, H, W, W].
    Reference matching.py:126-151.
    """
    b, h, w, c = feature0.shape

    from unimatch_tpu.parallel.context import sp_applicable

    sp = sp_applicable(h)  # the volume is row-separable: shard H
    if sp is not None:
        from unimatch_tpu.parallel.sequence_parallel import (
            sp_global_correlation_softmax_stereo,
        )

        mesh, axis = sp
        return sp_global_correlation_softmax_stereo(mesh, feature0, feature1, axis=axis), None

    corr = jnp.einsum(
        "bhic,bhjc->bhij", feature0, feature1, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(c))  # [B, H, W, W]

    # disparity >= 0: target column j must be <= source column i
    j = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    i = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    corr = jnp.where((j <= i)[None, None], corr, -1e9)

    prob = jax.nn.softmax(corr, axis=-1)  # [B, H, W, W] fp32
    x_grid = jnp.arange(w, dtype=jnp.float32)
    correspondence = jnp.einsum("bhij,j->bhi", prob, x_grid)  # [B, H, W]
    disparity = x_grid[None, None, :] - correspondence
    return disparity.astype(feature0.dtype)[..., None], prob


def local_correlation_softmax_stereo(
    feature0: jnp.ndarray, feature1: jnp.ndarray, local_radius: int
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """1D windowed stereo matching (1 x (2R+1) window), static shifts.

    features: [B, H, W, C] -> disparity [B, H, W, 1], prob [B, H, W, 2R+1].
    Reference matching.py:154-200.
    """
    b, h, w, c = feature0.shape
    r = local_radius
    k = 2 * r + 1

    # horizontal-only patches: pad W by r, stack shifted slices
    f1p = jnp.pad(feature1, ((0, 0), (0, 0), (r, r), (0, 0)))
    patches = jnp.stack([f1p[:, :, j : j + w, :] for j in range(k)], axis=3)  # [B,H,W,k,C]
    corr = jnp.einsum(
        "bhwnc,bhwc->bhwn", patches, feature0, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(c))

    offs_x = jnp.arange(-r, r + 1, dtype=jnp.float32)  # [k]
    xs = jnp.arange(w, dtype=jnp.float32)
    sample_x = xs[None, :, None] + offs_x[None, None, :]  # [1, W, k]
    valid = (sample_x >= 0) & (sample_x < w)
    corr = jnp.where(valid[None], corr, -1e9)

    prob = jax.nn.softmax(corr, axis=-1)
    # flow_x = E[offset_x]; disparity = -flow_x
    flow_x = jnp.einsum("bhwn,n->bhw", prob, offs_x)
    return (-flow_x).astype(feature0.dtype)[..., None], prob


def local_correlation_softmax_stereo_disp(
    feature0: jnp.ndarray, feature1: jnp.ndarray, local_radius: int
) -> jnp.ndarray:
    """Disparity-only 1-D local matching — what the model consumes
    (models/unimatch.py discards the prob output). Dispatches to the fused
    streaming-softmax kernel (kernels/local_corr.py, ry=0) behind its OWN
    flag UNIMATCH_FUSE_LOCAL_CORR_1D, default ON since round 4f: on-chip
    Mosaic compile confirmed, end-to-end parity 9.8e-6 on 3.70 absmax, and
    the gmstereo-regrefine3 A/B wins 44.8 vs 45.0-45.5 ms
    (docs/artifacts_round4_tpu.jsonl, session_r4f)."""
    if os.environ.get("UNIMATCH_FUSE_LOCAL_CORR_1D", "1") != "0":
        from unimatch_tpu.kernels import use_pallas

        if use_pallas():
            from unimatch_tpu.kernels.local_corr import local_corr_softmax_disp

            return local_corr_softmax_disp(
                feature0, feature1, local_radius
            ).astype(feature0.dtype)
    return local_correlation_softmax_stereo(feature0, feature1, local_radius)[0]


def _pose_depth_pixel_coords(
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    depth: jnp.ndarray,
    clamp_min_depth: float = 1e-3,
) -> jnp.ndarray:
    """Projective sample coords for the plane-sweep: [B, D, H, W, 2] (x, y)."""
    b, d, h, w = depth.shape
    grid = G.batched_coords_grid(b, h, w, homogeneous=True)  # [B, H, W, 3]
    k_inv = jnp.linalg.inv(intrinsics)
    rays = jnp.einsum("bij,bhwj->bhwi", k_inv, grid, precision="highest")  # [B, H, W, 3]
    rot_rays = jnp.einsum("bij,bhwj->bhwi", pose[:, :3, :3], rays, precision="highest")  # [B, H, W, 3]
    points = rot_rays[:, None] * depth[..., None] + pose[:, None, None, None, :3, 3]  # [B,D,H,W,3]
    proj = jnp.einsum("bij,bdhwj->bdhwi", intrinsics, points, precision="highest")
    zc = jnp.maximum(proj[..., 2], clamp_min_depth)
    return jnp.stack([proj[..., 0] / zc, proj[..., 1] / zc], axis=-1)  # [B, D, H, W, 2]


def warp_with_pose_depth_candidates(
    feature1: jnp.ndarray,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    depth: jnp.ndarray,
    clamp_min_depth: float = 1e-3,
) -> jnp.ndarray:
    """Plane-sweep warp: sample feature1 at D depth hypotheses.

    feature1: [B, H, W, C], intrinsics [B, 3, 3], pose [B, 4, 4] (ref->tgt),
    depth [B, D, H, W] (metric depth) -> warped [B, D, H, W, C].
    Reference matching.py:239-282.
    """
    pixel = _pose_depth_pixel_coords(intrinsics, pose, depth, clamp_min_depth)
    return G.grid_sample(feature1, pixel, padding_mode="zeros")  # [B, D, H, W, C]


def correlation_softmax_depth(
    feature0: jnp.ndarray,
    feature1: jnp.ndarray,
    intrinsics: jnp.ndarray,
    pose: jnp.ndarray,
    depth_candidates: jnp.ndarray,
    depth_from_argmax: bool = False,
    pred_bidir_depth: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Plane-sweep matching over inverse-depth candidates.

    features: [B, H, W, C]; depth_candidates [B, D, H, W] (*inverse* depth).
    Returns (depth [B, H, W, 1] in inverse-depth space, prob [B, D, H, W]).
    Reference matching.py:203-236.
    """
    b, h, w, c = feature0.shape
    if pred_bidir_depth:
        feature0, feature1 = (
            jnp.concatenate([feature0, feature1], axis=0),
            jnp.concatenate([feature1, feature0], axis=0),
        )
        intrinsics = jnp.concatenate([intrinsics, intrinsics], axis=0)
        pose = jnp.concatenate([pose, jnp.linalg.inv(pose)], axis=0)
        depth_candidates = jnp.concatenate([depth_candidates, depth_candidates], axis=0)

    # A prebuilt-[P, HW]-volume reformulation of this correlation (one MXU
    # matmul + 4 scalar take_along_axis gathers per candidate) measured ~3x
    # SLOWER on chip (17.1 vs 5.4 ms isolated, 21.8 vs 12.4 ms full GMDepth
    # forward — docs/PERF_NOTES.md round 5): sub-transaction scalar gathers
    # lose to the 4-feature-row grid-sample warp, the same failure mode as
    # the round-2 flat RAFT-style refine volume. Removed (git cbab3e9).
    # A blend-after-dot form (UNIMATCH_DEPTH_WARP_DOT, ops/geometry.py
    # grid_sample_dot — never materialize the [B, D, H, W, C] warped tensor)
    # measured a TIE in situ (round-5e) and its double-width "pair" gather
    # variant LOST (+0.7 ms, round-5f): the 4x256 B corner-row gathers are
    # spatially coherent and already coalesce. Both removed (round-5 prune);
    # the warp+einsum below is the measured-best form.
    warped = warp_with_pose_depth_candidates(
        feature1, intrinsics, pose, 1.0 / depth_candidates
    )  # [B, D, H, W, C]
    corr = jnp.einsum(
        "bdhwc,bhwc->bdhw", warped, feature0, preferred_element_type=jnp.float32
    ) / jnp.sqrt(jnp.float32(c))

    prob = jax.nn.softmax(corr, axis=1)  # over D, fp32

    if depth_from_argmax:
        idx = jnp.argmax(prob, axis=1, keepdims=True)  # [B, 1, H, W]
        depth = jnp.take_along_axis(depth_candidates, idx, axis=1)[:, 0]
    else:
        depth = jnp.sum(prob * depth_candidates, axis=1)  # [B, H, W]
    return depth.astype(feature0.dtype)[..., None], prob
