"""Fused two-conv head Pallas kernel: conv(k1) -> act -> conv(k2) + bias.

Covers the refine heads (reference reg_refine.py:6-18 FlowHead and
unimatch.py's upsampler mask head): a 3x3 cin->chid conv + ReLU followed by
a KxK (3x3 or 1x1) chid->cout conv whose cout is tiny (flow delta 1-2,
upsample mask 144). On the XLA path each of these costs a full set of f32
tap partials (~264 MB HBM round-trip per conv at the flagship s1 shape,
docs/PERF_NOTES.md), and the narrow output's f32 partials lane-pad 2 -> 128,
multiplying the logical traffic ~64x. Here the [*, chid] hidden activations
live and die in VMEM and the only HBM traffic is the input band read plus
one lane-padded bf16 output write.

Same banding design as kernels/conv_banded.py (its in-kernel notes apply):
the caller materializes overlapping row bands in XLA (BlockSpec cannot
express overlapping blocks), halo = (kh1-1) + (kh2-1) rows, so Mosaic's grid
pipeline double-buffers the band DMAs. The hidden channel axis is processed
in 128-wide chunks so the f32 accumulators fit scoped VMEM at T=8 bands.

Weight layout is the checkpoint layout ([kh, kw, cin, cout]).  pallas_call
has no autodiff: training runs the jnp twin's vjp via custom_vjp.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_ACTS = {
    None: lambda x: x,
    "relu": lambda x: jnp.maximum(x, 0.0),
}

_LANES = 128


def _align(n: int, m: int) -> int:
    return -(-n // m) * m


def _kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
            kh1, kw1, kh2, kw2, H, W, wh8, act1, n_chunks):
    """x [1, 1, T+halo, Wp, cin]; w1 [kh1*kw1, cin, chid];
    w2 [n_chunks, kh2*kw2, 128, coutp]; o [1, T, W, coutp]."""
    xb = x_ref[0, 0]
    Tb, Wp, cin = xb.shape
    T = o_ref.shape[1]
    th = T + kh2 - 1  # hidden rows needed by conv2
    coutp = o_ref.shape[-1]
    ph2, pw2 = (kh2 - 1) // 2, (kw2 - 1) // 2

    # conv2's 'same' zero padding: hidden positions whose conv1 output index
    # falls outside the image must be ZERO, not conv1-of-the-zero-padding
    # (the padded x makes them nonzero). hidden[r, c] is conv1 output
    # (row j*T + r - ph2, col c - pw2); mask to the valid [0,H) x [0,W) box.
    # 3-D iotas from the start (Mosaic: no minor-dim insertion on narrow
    # types — CLAUDE.md landmine).
    if kh2 > 1 or kw2 > 1:
        j = pl.program_id(1)
        ri = jax.lax.broadcasted_iota(jnp.int32, (th, wh8, 1), 0) + (j * T - ph2)
        ci = jax.lax.broadcasted_iota(jnp.int32, (th, wh8, 1), 1) - pw2
        valid = (ri >= 0) & (ri < H) & (ci >= 0) & (ci < W)
    else:
        valid = None

    acc2 = None
    for ch in range(n_chunks):
        # conv1, one 128-wide chunk of the hidden channels: slice-then-dot so
        # the f32 accumulator is exactly [th, wh8, 128]
        acc1 = None
        for u in range(kh1):
            for v in range(kw1):
                sl = jax.lax.slice(xb, (u, v, 0), (u + th, v + wh8, cin))
                part = jax.lax.dot_general(
                    sl.reshape(th * wh8, cin),
                    w1_ref[ch * kh1 * kw1 + u * kw1 + v],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc1 = part if acc1 is None else acc1 + part
        acc1 = acc1 + b1_ref[0, ch * _LANES : (ch + 1) * _LANES].astype(jnp.float32)
        hidden = _ACTS[act1](acc1).astype(xb.dtype).reshape(th, wh8, _LANES)
        if valid is not None:
            hidden = jnp.where(valid, hidden, jnp.zeros((), hidden.dtype))

        # conv2 taps contract this hidden chunk into the output accumulator
        for u in range(kh2):
            for v in range(kw2):
                sl = jax.lax.slice(hidden, (u, v, 0), (u + T, v + W, _LANES))
                part = jax.lax.dot_general(
                    sl.reshape(T * W, _LANES),
                    w2_ref[ch, u * kw2 + v],
                    (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc2 = part if acc2 is None else acc2 + part
    acc2 = acc2 + b2_ref[0].astype(jnp.float32)
    o_ref[0] = acc2.reshape(T, W, coutp).astype(o_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("kh1", "kw1", "kh2", "kw2", "act1", "interpret")
)
def _fused_head_impl(x, k1, b1, k2, b2, kh1, kw1, kh2, kw2, act1, interpret):
    b, h, w, cin = x.shape
    chid = k1.shape[-1]
    cout = k2.shape[-1]
    assert chid % _LANES == 0, "hidden width must be lane-aligned"
    n_chunks = chid // _LANES
    dt = x.dtype
    coutp = _align(cout, _LANES)

    ph1, pw1 = (kh1 - 1) // 2, (kw1 - 1) // 2
    ph2, pw2 = (kh2 - 1) // 2, (kw2 - 1) // 2
    halo = (kh1 - 1) + (kh2 - 1)

    # width: hidden cols = align8(W + kw2 - 1) (sliced reshapes need 8-aligned
    # rows); input cols = hidden cols + kw1 - 1
    wh8 = _align(w + (kw2 - 1), 8)
    wp = wh8 + (kw1 - 1)
    xp = jnp.pad(x, ((0, 0), (0, 0), (pw1 + pw2, wp - w - pw1 - pw2), (0, 0)))

    # rows: size the band so the in-kernel working set (input band, one
    # chunk's f32 conv1 accumulator + partial + bf16 hidden, f32 conv2
    # accumulator + partial) stays well under the 16 MB scoped-VMEM limit —
    # the wide-cout mask head at the stereo width is the tight case
    per_row = wp * (
        cin * dt.itemsize + _LANES * 8 + _LANES * dt.itemsize + coutp * 8
    )
    T = 16
    while T > 4 and (T + halo) * per_row > 8 * 1024 * 1024:
        T //= 2
    hp = _align(h, T)
    nt = hp // T
    xp = jnp.pad(xp, ((0, 0), (ph1 + ph2, hp - h + halo - ph1 - ph2), (0, 0), (0, 0)))
    rows = (
        jnp.arange(nt, dtype=jnp.int32)[:, None] * T
        + jnp.arange(T + halo, dtype=jnp.int32)[None, :]
    )
    xb = jnp.take(xp, rows, axis=1)  # [B, nT, T + halo, Wp, cin]

    # w1 chunked on cout: [n_chunks * kh1*kw1, cin, 128]
    w1 = (
        k1.reshape(kh1 * kw1, cin, n_chunks, _LANES)
        .transpose(2, 0, 1, 3)
        .reshape(n_chunks * kh1 * kw1, cin, _LANES)
        .astype(dt)
    )
    b1m = b1.reshape(1, chid).astype(dt)
    # w2 chunked on cin (the hidden chunks), cout zero-padded to lanes
    w2 = jnp.pad(
        k2.reshape(kh2 * kw2, n_chunks, _LANES, cout), ((0, 0),) * 3 + ((0, coutp - cout),)
    ).transpose(1, 0, 2, 3).astype(dt)
    b2m = jnp.pad(b2, (0, coutp - cout)).reshape(1, coutp).astype(dt)

    out = pl.pallas_call(
        functools.partial(
            _kernel, kh1=kh1, kw1=kw1, kh2=kh2, kw2=kw2, H=h, W=w, wh8=wh8,
            act1=act1, n_chunks=n_chunks,
        ),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, T + halo, wp, cin), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec(
                (n_chunks * kh1 * kw1, cin, _LANES), lambda i, j: (0, 0, 0)
            ),
            pl.BlockSpec((1, chid), lambda i, j: (0, 0)),
            pl.BlockSpec(
                (n_chunks, kh2 * kw2, _LANES, coutp), lambda i, j: (0, 0, 0, 0)
            ),
            pl.BlockSpec((1, coutp), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, w, coutp), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, coutp), dt),
        interpret=interpret,
    )(xb, w1, b1m, w2, b2m)
    return out[:, :h, :, :cout]


def _reference_head(x, k1, b1, k2, b2, kh1, kw1, kh2, kw2, act1):
    """Differentiable jnp twin (CPU path and custom-vjp backward). Matches
    the unfused Conv2d chain: f32 tap accumulation, bias, act, bf16 cast
    between the convs."""

    def conv(t, k, bb, kh, kw):
        y = jax.lax.conv_general_dilated(
            t, k.astype(t.dtype), (1, 1),
            [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32,
        ) + bb.astype(jnp.float32)
        return y

    hidden = _ACTS[act1](conv(x, k1, b1, kh1, kw1)).astype(x.dtype)
    return conv(hidden, k2, b2, kh2, kw2).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _with_vjp(kh1, kw1, kh2, kw2, act1):
    @jax.custom_vjp
    def f(x, k1, b1, k2, b2):
        return _fused_head_impl(x, k1, b1, k2, b2, kh1, kw1, kh2, kw2, act1, False)

    def fwd(x, k1, b1, k2, b2):
        return f(x, k1, b1, k2, b2), (x, k1, b1, k2, b2)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: _reference_head(*a, kh1, kw1, kh2, kw2, act1), *res
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_head(
    x: jnp.ndarray,  # [B, H, W, cin]
    k1: jnp.ndarray,  # [kh1, kw1, cin, chid], chid % 128 == 0
    b1: jnp.ndarray,
    k2: jnp.ndarray,  # [kh2, kw2, chid, cout]
    b2: Optional[jnp.ndarray],
    act1: str = "relu",
    interpret: bool = False,
) -> jnp.ndarray:
    """conv(act(conv(x, k1) + b1), k2) + b2, stride 1, 'same' padding."""
    kh1, kw1, _, chid = k1.shape
    kh2, kw2, chid2, cout = k2.shape
    assert chid == chid2 and x.shape[-1] == k1.shape[2]
    if b2 is None:
        b2 = jnp.zeros((cout,), x.dtype)
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_head(x, k1, b1, k2, b2, kh1, kw1, kh2, kw2, act1)
    if interpret:
        return _fused_head_impl(x, k1, b1, k2, b2, kh1, kw1, kh2, kw2, act1, True)
    return _with_vjp(kh1, kw1, kh2, kw2, act1)(x, k1, b1, k2, b2)
