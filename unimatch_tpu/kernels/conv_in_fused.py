"""Fused conv + InstanceNorm residual-block Pallas kernels (backbone).

The CNNEncoder (reference unimatch/backbone.py:39-133) is conv3x3 -> IN ->
relu chains. The XLA lowering pays two taxes per conv at the big stage-1
maps: the K shifted-matmul f32 tap partials round-trip HBM, and each
InstanceNorm is 3 more full passes (mean, var, normalize) over the map.
Here a residual block runs as TWO kernels + one cheap XLA join:

  conv1  reads the block input (XLA-banded rows), accumulates all 9 taps in
         VMEM, writes its raw (un-normalized) output ALREADY BANDED — each
         grid step emits its T rows plus a 1-row halo on each side, so conv2
         consumes the blocks directly with no gather between the kernels —
         and emits per-band IN moments (count, mean, M2) as a side output.
  conv2  normalizes + relus conv1's raw blocks in its prologue (masking the
         zero-pad frame back to zero: normalize(0) != 0), accumulates its 9
         taps in VMEM, writes raw output and moments.
  join   (XLA, one elementwise pass) out = relu(skip + relu(norm(raw2))).

Per-band moments combine EXACTLY in XLA via the parallel-variance identity
sum(x - mu)^2 = sum_j [M2_j + n_j (mu_j - mu)^2] — a two-pass-quality
variance, NOT the one-pass E[x^2] - E[x]^2 form whose ~1e-7 statistic shift
busts end-to-end parity (models/layers.py::_instance_norm_f32 docstring).
Stats are taken on the bf16-ROUNDED conv output, matching the unfused
instance_norm(conv_out) exactly up to f32 reduction order.

Design notes (the gru_fused recipe): plain non-overlapping BlockSpec tiles,
rows pre-banded XLA-side (conv1) or banded-by-construction (conv2), so
Mosaic's grid pipeline double-buffers the DMAs; every tap partial is f32 in
VMEM, rounded once to bf16 — identical to conv_via_matmul's rounding.

pallas_call has no autodiff: the public wrapper carries the jnp twin's vjp
(custom_vjp, the kernels/attention_expectation.py pattern); training
through the fused backbone differentiates the reference math.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _kernel(x_ref, w_ref, st_ref, o_ref, m_ref, *, T, W, H, pw, prologue,
            out_halo, dt):
    """One banded conv (+ optional norm-relu prologue) grid step.

    x  [1, 1, Tb, Wp, cin]   raw input band; rows are global rows
                             [j*(T) - halo_in, ...), cols [pw, pw+W) image
    w  [kh*kw, cin, cout]
    st [1, 8, cin] f32       row 0 mean, row 1 rsqrt(var+eps) (prologue),
                             per batch sample
    o  [1, 1, T + 2*out_halo, Wp, cout]  (banded out) or [1, T, W, cout]
    m  [1, 1, 8, cout] f32   row 0 count, row 1 mean, row 2 M2 of the
                             center T output rows (cols [0, W))
    """
    j = pl.program_id(1)
    xb = x_ref[0, 0]
    Tb, Wp, cin = xb.shape
    cout = w_ref.shape[-1]
    halo_in = (Tb - (T + 2 * out_halo)) // 2 + out_halo  # rows above out row 0

    if prologue:
        mean = st_ref[0, 0].astype(jnp.float32)
        rs = st_ref[0, 1].astype(jnp.float32)
        xf = (xb.astype(jnp.float32) - mean) * rs
        xf = jnp.maximum(xf, 0.0)
        # re-zero the pad frame: rows outside [0, H), cols outside the image
        gr = jax.lax.broadcasted_iota(jnp.int32, (Tb, Wp, 1), 0) + (
            j * T - halo_in
        )
        gc = jax.lax.broadcasted_iota(jnp.int32, (Tb, Wp, 1), 1)
        ok = (gr >= 0) & (gr < H) & (gc >= pw) & (gc < pw + W)
        xn = jnp.where(ok, xf, 0.0).astype(dt)
    else:
        xn = xb

    flat = xn.reshape(Tb * Wp, cin)
    Tout = T + 2 * out_halo
    kh = kw = int(round((w_ref.shape[0]) ** 0.5))
    ph = (kh - 1) // 2

    acc = None
    for u in range(kh):
        for v in range(kw):
            part = jax.lax.dot_general(
                flat, w_ref[u * kw + v], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            ).reshape(Tb, Wp, cout)
            # output row r (band-local, in [0, Tout)) reads input band row
            # r + (halo_in - out_halo) - ph + u; col c reads c - ph + v
            # (the pw >= ph zero margin keeps every read in-frame)
            r0 = halo_in - out_halo - ph + u
            sl = jax.lax.slice(part, (r0, 0, 0), (r0 + Tout, Wp, cout))
            if v != ph:
                sl = jax.lax.slice(
                    jnp.pad(sl, ((0, 0), (ph, ph), (0, 0))),
                    (0, v, 0), (Tout, v + Wp, cout),
                )
            acc = sl if acc is None else acc + sl

    raw = acc.astype(dt)  # single f32 -> dt rounding, as conv_via_matmul

    # moments of the center T rows, image cols, on the ROUNDED values —
    # identical statistics input as the unfused instance_norm(conv_out)
    ctr = jax.lax.slice(raw, (out_halo, pw, 0), (out_halo + T, pw + W, cout))
    gr = jax.lax.broadcasted_iota(jnp.int32, (T, W, 1), 0) + j * T
    valid = (gr < H).astype(jnp.float32)  # [T, W, 1], 1 per valid element
    cf = ctr.astype(jnp.float32) * valid
    cnt = jnp.sum(valid, axis=(0, 1))  # [1] = n_valid_rows * W
    cnt_c = jnp.broadcast_to(cnt, (cout,))
    s1 = jnp.sum(cf, axis=(0, 1))  # [cout]
    mean_b = s1 / jnp.maximum(cnt_c, 1.0)
    d = (cf - mean_b) * valid
    m2_b = jnp.sum(d * d, axis=(0, 1))
    mrow = jnp.stack(
        [cnt_c, mean_b, m2_b] + [jnp.zeros((cout,), jnp.float32)] * 5, axis=0
    )
    m_ref[0, 0] = mrow

    if out_halo:
        # zero the col margins so conv2 can consume the band directly
        gc = jax.lax.broadcasted_iota(jnp.int32, (Tout, Wp, 1), 1)
        okc = (gc >= pw) & (gc < pw + W)
        o_ref[0, 0] = jnp.where(okc, raw, jnp.zeros((), dt))
    else:
        o_ref[0] = jax.lax.slice(raw, (0, pw, 0), (T, pw + W, cout))


def combine_moments(m: jnp.ndarray, eps: float = 1e-5):
    """[B, nb, 8, C] per-band (count, mean, M2) -> ([B, C] mean, [B, C] rsqrt).

    Exact parallel-variance combination (Chan et al.):
    M2_total = sum_j M2_j + sum_j n_j (mu_j - mu)^2, var = M2_total / N
    (biased variance, torch InstanceNorm2d semantics).
    """
    n = m[:, :, 0]  # [B, nb, C]
    mu = m[:, :, 1]
    m2 = m[:, :, 2]
    ntot = jnp.sum(n, axis=1)
    mean = jnp.sum(n * mu, axis=1) / jnp.maximum(ntot, 1.0)
    m2tot = jnp.sum(m2, axis=1) + jnp.sum(n * jnp.square(mu - mean[:, None]), axis=1)
    var = m2tot / jnp.maximum(ntot, 1.0)
    return mean, jax.lax.rsqrt(var + eps)


def _pick_t(per_row_bytes: int, extra_rows: int, budget: int = 6 * 1024 * 1024) -> int:
    t = 32
    while t > 8 and (t + extra_rows) * per_row_bytes > budget:
        t //= 2
    return t


def _band(x, nb, T, lead_halo, tail_halo):
    """[B, H*, Wp, C] (already row-padded) -> [B, nb, T + lead+tail, Wp, C]."""
    rows = (
        jnp.arange(nb, dtype=jnp.int32)[:, None] * T
        + jnp.arange(T + lead_halo + tail_halo, dtype=jnp.int32)[None, :]
    )
    return jnp.take(x, rows, axis=1)


@functools.partial(
    jax.jit,
    static_argnames=("kh", "prologue", "out_halo", "T", "H", "W", "pw", "interpret"),
)
def _conv_band_impl(xb, w, stats, kh, prologue, out_halo, T, H, W, pw, interpret):
    """xb: [B, nb, Tb, Wp, cin] banded raw input. Returns (out, moments)."""
    b, nb, Tb, Wp, cin = xb.shape
    cout = w.shape[-1]
    dt = xb.dtype
    wmat = w.reshape(kh * kh, cin, cout).astype(dt)
    if prologue:
        st = jnp.stack([stats[0], stats[1]], axis=1)  # [B, 2, cin] f32
    else:
        st = jnp.zeros((b, 2, cin), jnp.float32)
    st = jnp.pad(st, ((0, 0), (0, 6), (0, 0)))  # [B, 8, cin] f32

    Tout = T + 2 * out_halo
    if out_halo:
        out_shape = jax.ShapeDtypeStruct((b, nb, Tout, Wp, cout), dt)
        out_spec = pl.BlockSpec((1, 1, Tout, Wp, cout), lambda i, j: (i, j, 0, 0, 0))
    else:
        out_shape = jax.ShapeDtypeStruct((b, nb * T, W, cout), dt)
        out_spec = pl.BlockSpec((1, T, W, cout), lambda i, j: (i, j, 0, 0))
    out, m = pl.pallas_call(
        functools.partial(_kernel, T=T, W=W, H=H, pw=pw, prologue=prologue,
                          out_halo=out_halo, dt=dt),
        grid=(b, nb),
        in_specs=[
            pl.BlockSpec((1, 1, Tb, Wp, cin), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((kh * kh, cin, cout), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 8, cin), lambda i, j: (i, 0, 0)),
        ],
        out_specs=[out_spec,
                   pl.BlockSpec((1, 1, 8, cout), lambda i, j: (i, j, 0, 0))],
        out_shape=[out_shape, jax.ShapeDtypeStruct((b, nb, 8, cout), jnp.float32)],
        interpret=interpret,
    )(xb, wmat, st)
    return out, m


def residual_block_fused(
    x: jnp.ndarray,  # [B, H, W, cin] materialized block input (bf16)
    k1: jnp.ndarray,  # [3, 3, cin, c]
    k2: jnp.ndarray,  # [3, 3, c, c]
    skip: Optional[jnp.ndarray] = None,  # defaults to x
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(skip + relu(IN(conv2(relu(IN(conv1(x))))))) with both convs'
    taps + norm prologues fused (reference backbone.py:6-36 semantics)."""
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_block(x, k1, k2, skip)
    if interpret:
        return _block_impl_wrapped(x, k1, k2, x if skip is None else skip, True)
    return _block_vjp()(x, k1, k2, x if skip is None else skip)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _block_impl_wrapped(x, k1, k2, skip, interpret=False):
    b, h, w, cin = x.shape
    c = k1.shape[-1]
    dt = x.dtype
    pw = 8  # col margin (>= 1 + 8-alignment for the image offset)
    wp = pw + -(-(w + 1) // 8) * 8 + (pw - 1)
    wp = -(-wp // 8) * 8

    per_row = wp * max(cin, c) * (2 + 8)
    T = _pick_t(per_row, 4)
    hp = -(-h // T) * T
    nb = hp // T

    # conv1 input: zero-padded frame, banded with T+4 rows (conv1 emits a
    # 1-row output halo, so it consumes rows [jT-2, jT+T+2))
    xp = jnp.pad(x, ((0, 0), (2, hp - h + 2), (pw, wp - w - pw), (0, 0)))
    xb1 = _band(xp, nb, T, 2, 2)
    raw1, m1 = _conv_band_impl(xb1, k1, None, 3, False, 1, T, h, w, pw, interpret)
    mean1, rs1 = combine_moments(m1)

    raw2, m2 = _conv_band_impl(raw1, k2, (mean1, rs1), 3, True, 0, T, h, w, pw,
                               interpret)
    mean2, rs2 = combine_moments(m2)

    raw2 = raw2[:, :h]
    y = (raw2.astype(jnp.float32) - mean2[:, None, None]) * rs2[:, None, None]
    y = jnp.maximum(y, 0.0)
    out = jnp.maximum(skip.astype(jnp.float32) + y, 0.0)
    return out.astype(dt)


def _reference_block(x, k1, k2, skip=None):
    """jnp twin — identical math to models/backbone.py::ResidualBlock with
    stride 1 and no downsample conv (norms affine-free, biased var)."""
    from unimatch_tpu.models.layers import conv_via_matmul, instance_norm

    if skip is None:
        skip = x
    y = instance_norm(conv_via_matmul(x, k1.astype(x.dtype), (1, 1), (1, 1)))
    y = jax.nn.relu(y)
    y = instance_norm(conv_via_matmul(y, k2.astype(x.dtype), (1, 1), (1, 1)))
    y = jax.nn.relu(y)
    return jax.nn.relu(skip + y)


@functools.lru_cache(maxsize=None)
def _block_vjp():
    @jax.custom_vjp
    def f(x, k1, k2, skip):
        return _block_impl_wrapped(x, k1, k2, skip, False)

    def fwd(x, k1, k2, skip):
        return f(x, k1, k2, skip), (x, k1, k2, skip)

    def bwd(res, g):
        _, vjp = jax.vjp(_reference_block, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def conv_in_relu_fused(
    x: jnp.ndarray,  # [B, H, W, cin] materialized input (bf16)
    k: jnp.ndarray,  # [3, 3, cin, cout]
    interpret: bool = False,
) -> jnp.ndarray:
    """relu(IN(conv3x3(x))) as one banded kernel + moment combine + an XLA
    normalize (for lone convs: the stride-2 blocks' conv2, stem followers)."""
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_cir(x, k)
    if interpret:
        return _cir_impl(x, k, True)
    return _cir_vjp()(x, k)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _cir_impl(x, k, interpret=False):
    b, h, w, cin = x.shape
    dt = x.dtype
    pw = 8
    wp = -(-(pw + w + pw) // 8) * 8
    per_row = wp * max(cin, k.shape[-1]) * (2 + 8)
    T = _pick_t(per_row, 2)
    hp = -(-h // T) * T
    nb = hp // T
    xp = jnp.pad(x, ((0, 0), (1, hp - h + 1), (pw, wp - w - pw), (0, 0)))
    xb = _band(xp, nb, T, 1, 1)
    raw, m = _conv_band_impl(xb, k, None, 3, False, 0, T, h, w, pw, interpret)
    mean, rs = combine_moments(m)
    raw = raw[:, :h]
    y = (raw.astype(jnp.float32) - mean[:, None, None]) * rs[:, None, None]
    return jnp.maximum(y, 0.0).astype(dt)


def _reference_cir(x, k):
    from unimatch_tpu.models.layers import conv_via_matmul, instance_norm

    y = instance_norm(conv_via_matmul(x, k.astype(x.dtype), (1, 1), (1, 1)))
    return jax.nn.relu(y)


@functools.lru_cache(maxsize=None)
def _cir_vjp():
    @jax.custom_vjp
    def f(x, k):
        return _cir_impl(x, k, False)

    def fwd(x, k):
        return f(x, k), (x, k)

    def bwd(res, g):
        _, vjp = jax.vjp(_reference_cir, *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f
