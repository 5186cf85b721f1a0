"""Banded fused convolution Pallas kernel (stride-1 'same', bias + act).

The successor to the rejected kernels/conv_fused.py: that kernel DMA'd
halo'd tiles by hand (BlockSpec index maps cannot express overlapping
blocks), which serialized transfer with compute and measured ~1.7x slower
than XLA (docs/PERF_NOTES.md round 3). Here the *caller* materializes the
halo: the row axis is pre-banded in XLA ([B, nT, T + kh - 1, Wp, Cin], one
cheap gather of large rows), so the kernel sees plain non-overlapping
BlockSpec tiles and Mosaic's grid pipeline double-buffers the DMAs
automatically. Width (plus kw-1 zero-pad columns) stays inside the block —
horizontal taps are sublane slices of VMEM.

Why it can beat XLA: conv_via_matmul (models/layers.py) writes and re-reads
an f32 partial per tap — a KxK conv moves ~K*K x (input + 2 x f32 output)
bytes of HBM; measured 1.47 ms for 3x3 256->192 at 112x256 (~6x off the
memory bound). Here tap partials accumulate in VMEM and the input is read
~(T + kh - 1)/T times.

Weight layout is the checkpoint layout ([kh, kw, cin, cout]) — conversion
unaffected. pallas_call has no autodiff: training runs the jnp reference
twin's vjp via custom_vjp.
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
    "sigmoid": jax.nn.sigmoid,
    "tanh": jnp.tanh,
}


def _kernel(x_ref, w_ref, b_ref, o_ref, *, kh, kw, W, act, banded):
    """x [1, (1,) Tb, Wp, cin]; w [kh*kw, cin, cout]; o [1, T, W, cout]."""
    xb = x_ref[0, 0] if banded else x_ref[0]
    Tb, Wp, cin = xb.shape
    cout = o_ref.shape[-1]
    T = Tb - (kh - 1)

    flat = xb.reshape(Tb * Wp, cin)
    acc = None
    for u in range(kh):
        for v in range(kw):
            part = jax.lax.dot_general(
                flat, w_ref[u * kw + v], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Tb, Wp, cout)
            sl = jax.lax.slice(part, (u, v, 0), (u + T, v + W, cout))
            acc = sl if acc is None else acc + sl
    acc = acc + b_ref[0].astype(jnp.float32)
    o_ref[0] = _ACTS[act](acc).astype(o_ref.dtype)


def _pick_t(per_row_bytes: int, extra_rows: int, budget: int = 6 * 1024 * 1024) -> int:
    t = 64
    while t > 8 and (t + extra_rows) * per_row_bytes > budget:
        t //= 2
    return t


@functools.partial(jax.jit, static_argnames=("kh", "kw", "act", "interpret"))
def _banded_conv2d_impl(x, kernel, bias, kh, kw, act, interpret):
    b, h, w, cin = x.shape
    cout = kernel.shape[-1]
    dt = x.dtype
    ph, pw = (kh - 1) // 2, (kw - 1) // 2

    wp = -(-(w + 2 * pw) // 8) * 8
    xp = jnp.pad(x, ((0, 0), (0, 0), (pw, wp - w - pw), (0, 0)))
    # inputs + one f32 tap partial + f32 accumulator
    per_row = wp * (cin * dt.itemsize + cout * 8)
    T = _pick_t(per_row, kh - 1)
    hp = -(-h // T) * T
    wmat = kernel.reshape(kh * kw, cin, cout).astype(dt)
    bmat = bias.reshape(1, cout).astype(dt)
    nt = hp // T

    if kh == 1:
        xp = jnp.pad(xp, ((0, 0), (0, hp - h), (0, 0), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_kernel, kh=kh, kw=kw, W=w, act=act, banded=False),
            grid=(b, nt),
            in_specs=[
                pl.BlockSpec((1, T, wp, cin), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((kh * kw, cin, cout), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, T, w, cout), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, hp, w, cout), dt),
            interpret=interpret,
        )(xp, wmat, bmat)
        return out[:, :h]

    xp = jnp.pad(xp, ((0, 0), (ph, hp - h + (kh - 1 - ph)), (0, 0), (0, 0)))
    rows = (
        jnp.arange(nt, dtype=jnp.int32)[:, None] * T
        + jnp.arange(T + kh - 1, dtype=jnp.int32)[None, :]
    )
    xb = jnp.take(xp, rows, axis=1)  # [B, nT, T + kh - 1, Wp, cin]
    out = pl.pallas_call(
        functools.partial(_kernel, kh=kh, kw=kw, W=w, act=act, banded=True),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, T + kh - 1, wp, cin), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((kh * kw, cin, cout), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, cout), lambda i, j: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, w, cout), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, w, cout), dt),
        interpret=interpret,
    )(xb, wmat, bmat)
    return out[:, :h]


def _reference_conv(x, kernel, bias, kh, kw, act):
    """Differentiable jnp twin (CPU path and custom-vjp backward)."""
    y = jax.lax.conv_general_dilated(
        x, kernel.astype(x.dtype), (1, 1),
        [((kh - 1) // 2, kh // 2), ((kw - 1) // 2, kw // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).astype(jnp.float32) + bias.astype(jnp.float32)
    return _ACTS[act](y).astype(x.dtype)


@functools.lru_cache(maxsize=None)
def _with_vjp(kh: int, kw: int, act: Optional[str]):
    @jax.custom_vjp
    def f(x, kernel, bias):
        return _banded_conv2d_impl(x, kernel, bias, kh, kw, act, False)

    def fwd(x, kernel, bias):
        return f(x, kernel, bias), (x, kernel, bias)

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _reference_conv(*a, kh, kw, act), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def banded_conv2d(
    x: jnp.ndarray,  # [B, H, W, cin]
    kernel: jnp.ndarray,  # [kh, kw, cin, cout]
    bias: Optional[jnp.ndarray] = None,
    act: Optional[str] = None,
    interpret: bool = False,
) -> jnp.ndarray:
    """act(conv2d(x, kernel) + bias), stride 1, 'same' zero padding."""
    kh, kw, cin, cout = kernel.shape
    assert x.shape[-1] == cin
    if bias is None:
        bias = jnp.zeros((cout,), x.dtype)
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_conv(x, kernel, bias, kh, kw, act)
    if interpret:
        return _banded_conv2d_impl(x, kernel, bias, kh, kw, act, True)
    return _with_vjp(kh, kw, act)(x, kernel, bias)
