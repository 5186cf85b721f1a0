"""Fused BasicMotionEncoder Pallas kernel.

One kernel invocation computes the whole motion-encoder conv chain
(reference unimatch/reg_refine.py:34-53):

    cor1   = relu(conv1x1(corr))        81  -> 256
    cor2   = relu(conv3x3(cor1))        256 -> 192
    flo1   = relu(conv7x7(flow))        fd  -> 128
    flo2   = relu(conv3x3(flo1))        128 -> 64
    motion = relu(conv3x3([cor2|flo2])) 256 -> 128-fd

with every intermediate resident in VMEM. The XLA form writes and re-reads
four full-map intermediates (plus f32 tap partials) per refine iteration;
the in-situ ablation puts the update net at ~4 ms/iteration of which the
motion chain is roughly half (docs/PERF_NOTES.md round 3).

Design (same recipe as kernels/gru_fused.py — plain BlockSpec tiles, rows
pre-banded in XLA, automatic double-buffering) with two tricks:

* The 7x7 conv's input has only fd <= 2 channels, so its 49 taps fold into
  an XLA-side im2col (flow -> [B, H, W, 49*fd], one cheap fused op on a
  0.15 MB map): in-kernel it becomes a 1x1 dot, and the chain's compound
  row halo shrinks from +-5 to +-2 (band = T + 4 rows).
* corr (81 lanes) and the flow im2col (98 lanes) pack into ONE 256-lane
  band input; the stage-1 weights are zero-extended over the lanes they
  ignore, so both stage-1 convs are full-width dots with no lane slicing.

Zero-padding correctness: a 'same' conv's out-of-image taps must read ZERO,
but relu(0 @ W + bias) = relu(bias) != 0 — so each intermediate is masked
back to zero outside the image (rows via the global row index, columns via
the static pad offset) before the next conv consumes it.

pallas_call has no autodiff: training runs the jnp twin's vjp (custom_vjp);
in practice the refine loop trains through the unfused module anyway.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_HALO = 2  # compound: motion conv (1) + cor2/flo2 convs (1); 7x7 via im2col


def _kernel(x_ref, wc1_ref, wf1_ref, wc2_ref, wf2_ref, wm_ref, b_ref, o_ref,
            *, T, W, H, fd, dt):
    """x [1, 1, T+4, Wp, 256]; o [1, T, W, 128-fd].

    Band row r is global row j*T + r - 2; padded columns [2, 2+W) are the
    image.
    """
    j = pl.program_id(1)
    xb = x_ref[0, 0]
    Tb, Wp, _ = xb.shape

    def mask(rows, row0):
        # iotas built 3-D from the start: inserting a minor dim on an i1
        # vector ("ok[..., None]") fails Mosaic ("insertion of minor dim
        # that is not a no-op only supported for 32-bit types")
        gr = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp, 1), 0) + (j * T + row0 - _HALO)
        gc = jax.lax.broadcasted_iota(jnp.int32, (rows, Wp, 1), 1)
        ok = (gr >= 0) & (gr < H) & (gc >= _HALO) & (gc < _HALO + W)
        return ok.astype(dt)

    def conv(src, nrows, w_ref, bias, K, rows_out, row0, src_row0):
        """KxK 'same' conv + bias + relu at band rows [row0, row0+rows_out);
        src covers band rows [src_row0, src_row0+nrows), full Wp width.
        Edge columns read within the Wp frame only — their values are
        masked to zero downstream, and image columns only ever read
        columns >= _HALO - (K-1)//2 >= 0. cout chunked at 128 to bound the
        f32 tap partial."""
        cin = src.shape[-1]
        cout = w_ref.shape[-1]
        flat = src.reshape(nrows * Wp, cin)
        pr = (K - 1) // 2
        outs = []
        for c0 in range(0, cout, 128):
            c1 = min(c0 + 128, cout)
            acc = None
            for u in range(K):
                for v in range(K):
                    part = jax.lax.dot_general(
                        flat, w_ref[u * K + v, :, c0:c1], (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    ).reshape(nrows, Wp, c1 - c0)
                    r0 = row0 - src_row0 - pr + u
                    sl = jax.lax.slice(part, (r0, 0, 0), (r0 + rows_out, Wp, c1 - c0))
                    if v != pr:
                        # horizontal tap: shift columns by v - pr, zero-fill
                        sl = jax.lax.slice(
                            jnp.pad(sl, ((0, 0), (pr, pr), (0, 0))),
                            (0, v, 0), (rows_out, v + Wp, c1 - c0),
                        )
                    acc = sl if acc is None else acc + sl
            outs.append(jnp.maximum(acc + bias[c0:c1].astype(jnp.float32), 0.0))
        return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)

    bc1 = b_ref[0, 0]
    bf1 = b_ref[0, 1, :128]
    bc2 = b_ref[0, 2, :192]
    bf2 = b_ref[0, 3, :64]
    bm = b_ref[0, 4, : 128 - fd]

    # stage 1 (both 1x1 after the im2col): the full band — stage 2's taps
    # read one row beyond its own rows on each side
    m1 = mask(Tb, 0)
    cor1 = conv(xb, Tb, wc1_ref, bc1, 1, Tb, 0, 0).astype(dt) * m1
    flo1 = conv(xb, Tb, wf1_ref, bf1, 1, Tb, 0, 0).astype(dt) * m1

    # stage 2: rows +-1 of the output rows, lane-concat for the merge conv
    m2 = mask(T + 2, 1)
    cor2 = conv(cor1, Tb, wc2_ref, bc2, 3, T + 2, 1, 0).astype(dt) * m2
    flo2 = conv(flo1, Tb, wf2_ref, bf2, 3, T + 2, 1, 0).astype(dt) * m2
    merged = jnp.concatenate([cor2, flo2], axis=-1)  # [T+2, Wp, 256]

    motion = conv(merged, T + 2, wm_ref, bm, 3, T, 2, 1)
    o_ref[0] = jax.lax.slice(
        motion, (0, _HALO, 0), (T, _HALO + W, motion.shape[-1])
    ).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("fd", "interpret", "two_stage"))
def _motion_fused_impl(corr, flow, wc1, wc2, wf1, wf2, wm, biases, fd, interpret,
                       two_stage=False):
    b, h, w, ck = corr.shape
    dt = corr.dtype
    T = 8
    hp = -(-h // T) * T
    wp = -(-(w + 2 * _HALO) // 8) * 8

    # flow 7x7 im2col (fd <= 2 channels -> 49*fd <= 98 lanes), zero padded.
    # Two-stage form (UNIMATCH_MOTION_IM2COL=2stage): one 7-slice row-shift
    # concat to [*, 7*fd], then one 7-slice col-shift concat of THAT —
    # 14 lane-concat reads instead of a flat 49-way concat of [H, W, fd]
    # slices, each of which lane-pads fd -> 128 physically (the round-5
    # profiler put the flat form's concat + pad_slice fusions at
    # ~1.07 ms/iteration, ~6.4 ms/fwd). Weight rows are reordered to match
    # (lane k = v*7*fd + u*fd + ch); values identical up to f32 summation
    # order inside the stage-1 dot.
    fp = jnp.pad(flow, ((0, 0), (3, 3), (3, 3), (0, 0)))
    if two_stage:
        frow = jnp.concatenate(
            [fp[:, u : u + h, :, :] for u in range(7)], axis=-1
        )  # [B, H, W+6, 7*fd], lanes u-major
        fim = jnp.concatenate(
            [frow[:, :, v : v + w, :] for v in range(7)], axis=-1
        )  # [B, H, W, 49*fd], lanes v-major over (u, ch)
    else:
        fim = jnp.concatenate(
            [fp[:, u : u + h, v : v + w, :] for u in range(7) for v in range(7)],
            axis=-1,
        )  # [B, H, W, 49*fd], lanes (u, v)-major

    # one lane-aligned band input: [corr | 0 -> 128 | im2col(flow) | 0 -> 256]
    x = jnp.concatenate(
        [
            jnp.pad(corr, ((0, 0), (0, 0), (0, 0), (0, 128 - ck))),
            jnp.pad(fim, ((0, 0), (0, 0), (0, 0), (0, 128 - 49 * fd))),
        ],
        axis=-1,
    )
    x = jnp.pad(x, ((0, 0), (_HALO, hp - h + _HALO), (_HALO, wp - w - _HALO), (0, 0)))
    nt = hp // T
    rows = (
        jnp.arange(nt, dtype=jnp.int32)[:, None] * T
        + jnp.arange(T + 2 * _HALO, dtype=jnp.int32)[None, :]
    )
    xb = jnp.take(x, rows, axis=1)  # [B, nt, T+4, Wp, 256]

    # stage-1 weights, zero-extended over the lanes they ignore; the
    # two-stage im2col orders lanes v-major over (u, ch)
    wf1r = wf1.transpose(1, 0, 2, 3) if two_stage else wf1
    wc1m = jnp.zeros((256, 256), dt).at[:ck].set(wc1.reshape(ck, 256).astype(dt))
    wf1m = (
        jnp.zeros((256, 128), dt)
        .at[128 : 128 + 49 * fd]
        .set(wf1r.reshape(49 * fd, 128).astype(dt))
    )
    bmat = jnp.zeros((1, 5, 256), dt)
    for i, bias in enumerate(biases):
        bmat = bmat.at[0, i, : bias.shape[0]].set(bias.astype(dt))

    out = pl.pallas_call(
        functools.partial(_kernel, T=T, W=w, H=h, fd=fd, dt=dt),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, T + 2 * _HALO, wp, 256), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, 256, 256), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 256, 128), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((9, 256, 192), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((9, 128, 64), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((9, 256, 128 - fd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 5, 256), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, w, 128 - fd), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, 128 - fd), dt),
        interpret=interpret,
    )(
        xb.astype(dt),
        wc1m.reshape(1, 256, 256),
        wf1m.reshape(1, 256, 128),
        wc2.reshape(9, 256, 192).astype(dt),
        wf2.reshape(9, 128, 64).astype(dt),
        wm.reshape(9, 256, 128 - fd).astype(dt),
        bmat,
    )
    return out[:, :h]


def _reference_motion(corr, flow, wc1, wc2, wf1, wf2, wm, biases, fd):
    """Differentiable jnp twin — identical math to BasicMotionEncoder."""

    def c(x, k, b, pad):
        y = jax.lax.conv_general_dilated(
            x, k.astype(x.dtype), (1, 1), [(pad, pad), (pad, pad)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ).astype(jnp.float32)
        return jnp.maximum(y + b.astype(jnp.float32), 0.0).astype(x.dtype)

    bc1, bf1, bc2, bf2, bm = biases
    cor = c(corr, wc1, bc1, 0)
    cor = c(cor, wc2, bc2, 1)
    flo = c(flow, wf1, bf1, 3)
    flo = c(flo, wf2, bf2, 1)
    return c(jnp.concatenate([cor, flo], axis=-1), wm, bm, 1)


@functools.lru_cache(maxsize=None)
def _with_vjp(fd: int, two_stage: bool = False):
    @jax.custom_vjp
    def f(corr, flow, wc1, wc2, wf1, wf2, wm, biases):
        return _motion_fused_impl(corr, flow, wc1, wc2, wf1, wf2, wm, biases, fd,
                                  False, two_stage=two_stage)

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _reference_motion(*a, fd), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def motion_encoder_fused(
    corr: jnp.ndarray,  # [B, H, W, (2R+1)^2]
    flow: jnp.ndarray,  # [B, H, W, fd]
    wc1: jnp.ndarray,  # [1, 1, ck, 256]
    wc2: jnp.ndarray,  # [3, 3, 256, 192]
    wf1: jnp.ndarray,  # [7, 7, fd, 128]
    wf2: jnp.ndarray,  # [3, 3, 128, 64]
    wm: jnp.ndarray,  # [3, 3, 256, 128-fd]
    biases,  # (bc1, bf1, bc2, bf2, bm) -- NOTE: order matches b_ref layout
    interpret: bool = False,
) -> jnp.ndarray:
    """relu-conv chain of BasicMotionEncoder in one VMEM-resident pass."""
    fd = flow.shape[-1]
    biases = tuple(biases)
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_motion(corr, flow, wc1, wc2, wf1, wf2, wm, biases, fd)
    import os

    # env read OUTSIDE the jitted impl (trace-cache safety). Default 2stage
    # since round-5c: in-situ −5.4 ms on the flagship (the flat 49-way
    # concat's physical fd->128 lane pads cost ~6.4 ms/fwd); one-step parity
    # pinned in tests, values differ only in stage-1 f32 summation order.
    two_stage = os.environ.get("UNIMATCH_MOTION_IM2COL", "2stage") == "2stage"
    if interpret:
        return _motion_fused_impl(corr, flow, wc1, wc2, wf1, wf2, wm, biases, fd,
                                  True, two_stage=two_stage)
    return _with_vjp(fd, two_stage)(corr, flow, wc1, wc2, wf1, wf2, wm, biases)
