"""Fused SepConvGRU direction-pass Pallas kernels.

One kernel invocation computes a full GRU direction update (reference
unimatch/reg_refine.py:9-31 — convz/convr/convq + gates):

    xz, xr, xq = conv(x, kx_z), conv(x, kx_r), conv(x, kx_q)
    hz, hr     = conv(h, kh_z), conv(h, kh_r)
    z = sigmoid(hz + xz + bz);  r = sigmoid(hr + xr + br)
    q = tanh(conv(r*h, kh_q) + xq + bq)
    h' = (1-z)*h + z*q

entirely in VMEM. The XLA lowering (models/layers.py:conv_via_matmul) writes
and re-reads an f32 partial per conv tap — ~2 GB of HBM round-trips per
refine iteration at the flagship shape, measured ~6x off the memory bound
(docs/PERF_NOTES.md round 3). Here each row-block of h/x is read once, all
tap partials accumulate in VMEM, and only h' returns to HBM: ~30 MB/pass.

Design notes (vs the rejected kernels/conv_fused.py, which DMA'd halo'd
tiles by hand and therefore serialized transfer with compute):

* Blocks are plain non-overlapping BlockSpec tiles, so Mosaic's grid
  pipeline double-buffers the DMAs automatically.
* The horizontal pass (1xK kernels) keeps the full padded width inside the
  block — every tap is a sublane slice of VMEM, no halo at all.
* The vertical pass (Kx1 kernels) needs rows [i*T - 2(K-1), i*T + T + 2(K-1))
  because the q conv consumes r*h, which itself comes from convs: the caller
  pre-bands the row axis in XLA ([B, nT, T + 4*pr, W, C], one cheap gather of
  large rows) and the kernel recomputes z/r on the inner halo.
* Every MXU dot has cout = hd (the gates are computed separately), keeping
  each f32 tap partial under ~2 MB of VMEM.
* Tap accumulation is f32, rounded to the compute dtype once per conv —
  matching conv_via_matmul's single rounding; gate elementwise math runs in
  f32 on those rounded values (the XLA path's elementwise ops run in bf16,
  so outputs differ at bf16-rounding level).

pallas_call has no autodiff: training runs the jnp reference twin's vjp via
custom_vjp (`_with_vjp` pattern, kernels/attention_expectation.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

# Weight lane layout: kx [K, cx, 3*hd] packs the x-side slices of
# convz|convr|convq; khzr [K, hd, 2*hd] packs the h-side of convz|convr;
# kqh [K, hd, hd] is convq's h-side; bzrq [3, hd] packs (bz, br, bq).


def _hkernel(x_ref, h_ref, kx_ref, khzr_ref, kqh_ref, b_ref, o_ref, *, K, W, hd, dt):
    """Horizontal (1xK) pass. Blocks: x [1, T, Wp, cx], h [1, T, Wp, hd],
    o [1, T, W, hd]. Wp >= W + K - 1; the leading (K-1)//2 columns are the
    conv's zero padding, so tap k of a 'same' conv reads columns [k, k+W)."""
    T = x_ref.shape[1]
    Wp = x_ref.shape[2]
    cx = x_ref.shape[3]
    pr = (K - 1) // 2

    xf = x_ref[0].reshape(T * Wp, cx)
    hf = h_ref[0].reshape(T * Wp, hd)

    def conv_w(flat, w_ref, off):
        """1xK 'same' conv -> [T, W, hd] f32; weight lanes [off, off+hd)."""
        acc = None
        for k in range(K):
            part = jax.lax.dot_general(
                flat, w_ref[k, :, off : off + hd],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).reshape(T, Wp, hd)
            sl = jax.lax.slice(part, (0, k, 0), (T, k + W, hd))
            acc = sl if acc is None else acc + sl
        return acc

    xz = conv_w(xf, kx_ref, 0).astype(dt).astype(jnp.float32)
    xr = conv_w(xf, kx_ref, hd).astype(dt).astype(jnp.float32)
    xq = conv_w(xf, kx_ref, 2 * hd).astype(dt).astype(jnp.float32)
    hz = conv_w(hf, khzr_ref, 0).astype(dt).astype(jnp.float32)
    hr = conv_w(hf, khzr_ref, hd).astype(dt).astype(jnp.float32)

    z = jax.nn.sigmoid(hz + xz + b_ref[0, 0].astype(jnp.float32))
    r = jax.nn.sigmoid(hr + xr + b_ref[0, 1].astype(jnp.float32))
    hc = jax.lax.slice(h_ref[0], (0, pr, 0), (T, pr + W, hd)).astype(jnp.float32)
    # zero-pad r*h back to Wp so the q conv sees 'same' zero padding
    rhp = jnp.pad((r * hc).astype(dt), ((0, 0), (pr, Wp - W - pr), (0, 0)))
    qh = conv_w(rhp.reshape(T * Wp, hd), kqh_ref, 0).astype(dt).astype(jnp.float32)
    q = jnp.tanh(qh + xq + b_ref[0, 2].astype(jnp.float32))
    o_ref[0] = ((1.0 - z) * hc + z * q).astype(o_ref.dtype)


def _vkernel(x_ref, h_ref, kx_ref, khzr_ref, kqh_ref, b_ref, o_ref, *, K, hd, dt):
    """Vertical (Kx1) pass. Blocks: x [1, 1, T + 4*pr, W, cx], h likewise,
    o [1, T, W, hd]. pr = (K-1)//2; band rows [2*pr, 2*pr + T) are the output
    rows; z/r are recomputed on the q conv's pr-row halo."""
    Tb = x_ref.shape[2]
    W = x_ref.shape[3]
    cx = x_ref.shape[4]
    pr = (K - 1) // 2
    T = Tb - 4 * pr
    Ti = T + 2 * pr  # rows where z/r/(r*h) are needed

    xf = x_ref[0, 0].reshape(Tb * W, cx)
    hf = h_ref[0, 0].reshape(Tb * W, hd)

    def conv_rows(flat, nrows, w_ref, off, rows_out, row0):
        """Kx1 'same' conv at band rows [row0, row0 + rows_out) -> f32."""
        acc = None
        for k in range(K):
            part = jax.lax.dot_general(
                flat, w_ref[k, :, off : off + hd],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).reshape(nrows, W, hd)
            sl = jax.lax.slice(
                part, (row0 - pr + k, 0, 0), (row0 - pr + k + rows_out, W, hd)
            )
            acc = sl if acc is None else acc + sl
        return acc

    # z/r on the inner halo rows [pr, pr + Ti) of the band
    xz = conv_rows(xf, Tb, kx_ref, 0, Ti, pr).astype(dt).astype(jnp.float32)
    xr = conv_rows(xf, Tb, kx_ref, hd, Ti, pr).astype(dt).astype(jnp.float32)
    hz = conv_rows(hf, Tb, khzr_ref, 0, Ti, pr).astype(dt).astype(jnp.float32)
    hr = conv_rows(hf, Tb, khzr_ref, hd, Ti, pr).astype(dt).astype(jnp.float32)

    hi = jax.lax.slice(h_ref[0, 0], (pr, 0, 0), (pr + Ti, W, hd)).astype(jnp.float32)
    z_i = jax.nn.sigmoid(hz + xz + b_ref[0, 0].astype(jnp.float32))
    r_i = jax.nn.sigmoid(hr + xr + b_ref[0, 1].astype(jnp.float32))
    rh = (r_i * hi).astype(dt)  # [Ti, W, hd]; rh row i == band row i + pr

    # q conv at band rows [2*pr, 2*pr + T) == rh rows [pr, pr + T)
    qh = conv_rows(rh.reshape(Ti * W, hd), Ti, kqh_ref, 0, T, pr).astype(dt)
    xq = conv_rows(xf, Tb, kx_ref, 2 * hd, T, 2 * pr).astype(dt).astype(jnp.float32)
    q = jnp.tanh(qh.astype(jnp.float32) + xq + b_ref[0, 2].astype(jnp.float32))

    z_c = jax.lax.slice(z_i, (pr, 0, 0), (pr + T, W, hd))
    h_c = jax.lax.slice(hi, (pr, 0, 0), (pr + T, W, hd))
    o_ref[0] = ((1.0 - z_c) * h_c + z_c * q).astype(o_ref.dtype)


def _vkernel_col(x_ref, h_ref, kx_ref, khzr_ref, kqh_ref, b_ref, o_ref, *, K, H, hd, dt):
    """Vertical (Kx1) pass, COLUMN-strip form. Blocks: x [1, Hp, Wc, cx],
    h [1, Hp, Wc, hd], o [1, H, Wc, hd]; Hp >= H + 2*pr with pr zero rows on
    top (rows [pr, pr+H) are the image). A full-height column strip sees
    every row, so the vertical conv needs NO halo, NO banded input
    duplication, and NO z/r halo recompute — the row-band form (_vkernel)
    pays a jnp.take banded copy of x and h (~2x the map, per pass per
    iteration) plus 4*pr redundant rows per T-row band."""
    Hp = x_ref.shape[1]
    Wc = x_ref.shape[2]
    cx = x_ref.shape[3]
    pr = (K - 1) // 2

    xf = x_ref[0].reshape(Hp * Wc, cx)
    hf = h_ref[0].reshape(Hp * Wc, hd)

    def conv_rows(flat, w_ref, off):
        """Kx1 'same' conv at image rows -> [H, Wc, hd] f32 (rounded to dt
        once, as conv_via_matmul)."""
        acc = None
        for k in range(K):
            part = jax.lax.dot_general(
                flat, w_ref[k, :, off : off + hd],
                (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
            ).reshape(Hp, Wc, hd)
            sl = jax.lax.slice(part, (k, 0, 0), (k + H, Wc, hd))
            acc = sl if acc is None else acc + sl
        return acc.astype(dt)

    xz = conv_rows(xf, kx_ref, 0).astype(jnp.float32)
    xr = conv_rows(xf, kx_ref, hd).astype(jnp.float32)
    hz = conv_rows(hf, khzr_ref, 0).astype(jnp.float32)
    hr = conv_rows(hf, khzr_ref, hd).astype(jnp.float32)

    z = jax.nn.sigmoid(hz + xz + b_ref[0, 0].astype(jnp.float32))
    r = jax.nn.sigmoid(hr + xr + b_ref[0, 1].astype(jnp.float32))
    hc = jax.lax.slice(h_ref[0], (pr, 0, 0), (pr + H, Wc, hd)).astype(jnp.float32)
    # zero-pad r*h rows back to Hp so the q conv sees 'same' zero padding
    rhp = jnp.pad((r * hc).astype(dt), ((pr, Hp - H - pr), (0, 0), (0, 0)))
    qh = conv_rows(rhp.reshape(Hp * Wc, hd), kqh_ref, 0).astype(jnp.float32)
    xq = conv_rows(xf, kx_ref, 2 * hd).astype(jnp.float32)
    q = jnp.tanh(qh + xq + b_ref[0, 2].astype(jnp.float32))
    o_ref[0] = ((1.0 - z) * hc + z * q).astype(o_ref.dtype)


def _pick_t(per_row_bytes: int, extra_rows: int, budget: int = 6 * 1024 * 1024) -> int:
    t = 32
    while t > 8 and (t + extra_rows) * per_row_bytes > budget:
        t //= 2
    return t


@functools.partial(
    jax.jit, static_argnames=("K", "horizontal", "interpret", "t_override",
                              "v_col")
)
def _gru_pass_impl(h, x, kx, khzr, kqh, bzrq, K, horizontal, interpret,
                   t_override=None, v_col=0):
    b, hh, w, hd = h.shape
    cx = x.shape[-1]
    dt = h.dtype
    pr = (K - 1) // 2

    kxm = kx.reshape(K, cx, 3 * hd).astype(dt)
    khzrm = khzr.reshape(K, hd, 2 * hd).astype(dt)
    kqhm = kqh.reshape(K, hd, hd).astype(dt)
    bm = bzrq.reshape(1, 3, hd).astype(dt)

    if not horizontal and v_col:
        # column-strip vertical pass: zero-row-pad top/bottom, pad W to a
        # strip multiple, grid over full-height column strips (no banding)
        wc = v_col
        wp = -(-w // wc) * wc
        hp_rows = -(-(hh + 2 * pr) // 8) * 8
        xp = jnp.pad(x, ((0, 0), (pr, hp_rows - hh - pr), (0, wp - w), (0, 0)))
        hpd = jnp.pad(h, ((0, 0), (pr, hp_rows - hh - pr), (0, wp - w), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_vkernel_col, K=K, H=hh, hd=hd, dt=dt),
            grid=(b, wp // wc),
            in_specs=[
                pl.BlockSpec((1, hp_rows, wc, cx), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((1, hp_rows, wc, hd), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((K, cx, 3 * hd), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((K, hd, 2 * hd), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((K, hd, hd), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((1, 3, hd), lambda i, j: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, hh, wc, hd), lambda i, j: (i, 0, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, hh, wp, hd), dt),
            interpret=interpret,
        )(xp, hpd, kxm, khzrm, kqhm, bm)
        return out[:, :, :w]

    if horizontal:
        wp = -(-(w + 2 * pr) // 8) * 8
        xp = jnp.pad(x, ((0, 0), (0, 0), (pr, wp - w - pr), (0, 0)))
        hp = jnp.pad(h, ((0, 0), (0, 0), (pr, wp - w - pr), (0, 0)))
        # inputs + one f32 tap partial + z/r/q f32 temps
        per_row = wp * ((cx + hd) * dt.itemsize + hd * 4 * 5)
        T = t_override or _pick_t(per_row, 0)
        hh_p = -(-hh // T) * T
        xp = jnp.pad(xp, ((0, 0), (0, hh_p - hh), (0, 0), (0, 0)))
        hp = jnp.pad(hp, ((0, 0), (0, hh_p - hh), (0, 0), (0, 0)))
        out = pl.pallas_call(
            functools.partial(_hkernel, K=K, W=w, hd=hd, dt=dt),
            grid=(b, hh_p // T),
            in_specs=[
                pl.BlockSpec((1, T, wp, cx), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((1, T, wp, hd), lambda i, j: (i, j, 0, 0)),
                pl.BlockSpec((K, cx, 3 * hd), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((K, hd, 2 * hd), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((K, hd, hd), lambda i, j: (0, 0, 0)),
                pl.BlockSpec((1, 3, hd), lambda i, j: (0, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, T, w, hd), lambda i, j: (i, j, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((b, hh_p, w, hd), dt),
            interpret=interpret,
        )(xp, hp, kxm, khzrm, kqhm, bm)
        return out[:, :hh]

    # vertical: band rows with a 2*pr halo each side
    wpad = -(-w // 8) * 8 - w
    if wpad:
        x = jnp.pad(x, ((0, 0), (0, 0), (0, wpad), (0, 0)))
        h = jnp.pad(h, ((0, 0), (0, 0), (0, wpad), (0, 0)))
    wv = w + wpad
    per_row = wv * ((cx + hd) * dt.itemsize + hd * 4 * 5)
    halo = 2 * pr
    T = t_override or _pick_t(per_row, 2 * halo)
    hh_p = -(-hh // T) * T
    xp = jnp.pad(x, ((0, 0), (halo, hh_p - hh + halo), (0, 0), (0, 0)))
    hpd = jnp.pad(h, ((0, 0), (halo, hh_p - hh + halo), (0, 0), (0, 0)))
    nt = hh_p // T
    rows = (
        jnp.arange(nt, dtype=jnp.int32)[:, None] * T
        + jnp.arange(T + 2 * halo, dtype=jnp.int32)[None, :]
    )  # [nt, T + 4*pr] band row indices into the halo-padded map
    # mode="clip": rows is a static in-bounds iota band (max index is
    # hh_p + 2*halo - 1, the padded length), so fill-mode's select_n over
    # the banded copies is dead weight
    xb = jnp.take(xp, rows, axis=1, mode="clip")  # [B, nt, T + 4*pr, W, cx]
    hb = jnp.take(hpd, rows, axis=1, mode="clip")
    out = pl.pallas_call(
        functools.partial(_vkernel, K=K, hd=hd, dt=dt),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, T + 2 * halo, wv, cx), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, 1, T + 2 * halo, wv, hd), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((K, cx, 3 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((K, hd, 2 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((K, hd, hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 3, hd), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, wv, hd), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hh_p, wv, hd), dt),
        interpret=interpret,
    )(xb, hb, kxm, khzrm, kqhm, bm)
    return out[:, :hh, :w]


def _reference_gru_pass(h, x, kx, khzr, kqh, bzrq, K, horizontal):
    """Differentiable jnp twin — identical math to the unfused SepConvGRU
    weight-side-fused pass (models/reg_refine.py::_fused_pass)."""
    from unimatch_tpu.models.layers import conv_via_matmul

    hd = h.shape[-1]
    pad = (0, (K - 1) // 2) if horizontal else ((K - 1) // 2, 0)
    ksz = (1, K) if horizontal else (K, 1)
    kx4 = kx.reshape(*ksz, x.shape[-1], 3 * hd).astype(h.dtype)
    khzr4 = khzr.reshape(*ksz, hd, 2 * hd).astype(h.dtype)
    kqh4 = kqh.reshape(*ksz, hd, hd).astype(h.dtype)
    bz, br, bq = bzrq[0].astype(h.dtype), bzrq[1].astype(h.dtype), bzrq[2].astype(h.dtype)

    xacc = conv_via_matmul(x, kx4, (1, 1), pad)
    hzr = conv_via_matmul(h, khzr4, (1, 1), pad)
    z = jax.nn.sigmoid(hzr[..., :hd] + xacc[..., :hd] + bz)
    r = jax.nn.sigmoid(hzr[..., hd:] + xacc[..., hd : 2 * hd] + br)
    q = jnp.tanh(
        conv_via_matmul(r * h, kqh4, (1, 1), pad) + xacc[..., 2 * hd :] + bq
    )
    return (1 - z) * h + z * q


@functools.lru_cache(maxsize=None)
def _with_vjp(K: int, horizontal: bool, t_override=None, v_col=0):
    @jax.custom_vjp
    def f(h, x, kx, khzr, kqh, bzrq):
        return _gru_pass_impl(h, x, kx, khzr, kqh, bzrq, K, horizontal, False,
                              t_override=t_override, v_col=v_col)

    def fwd(h, x, kx, khzr, kqh, bzrq):
        return f(h, x, kx, khzr, kqh, bzrq), (h, x, kx, khzr, kqh, bzrq)

    def bwd(res, g):
        _, vjp = jax.vjp(
            lambda *a: _reference_gru_pass(*a, K, horizontal), *res
        )
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def gru_pass(
    h: jnp.ndarray,  # [B, H, W, hd]
    x: jnp.ndarray,  # [B, H, W, cx] (materialized GRU input concat)
    kx: jnp.ndarray,  # [1, K, cx, 3*hd] (horizontal) or [K, 1, cx, 3*hd]
    khzr: jnp.ndarray,  # [.., hd, 2*hd]
    kqh: jnp.ndarray,  # [.., hd, hd]
    bzrq: jnp.ndarray,  # [3, hd]
    horizontal: bool,
    interpret: bool = False,
) -> jnp.ndarray:
    """One fused SepConvGRU direction update; values match the XLA form up
    to bf16 elementwise rounding (conv accumulation rounds identically)."""
    K = kx.shape[1] if horizontal else kx.shape[0]
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_gru_pass(h, x, kx, khzr, kqh, bzrq, K, horizontal)
    if interpret:
        return _gru_pass_impl(h, x, kx, khzr, kqh, bzrq, K, horizontal, True)
    # band-size / column-strip A/B levers, read outside the jitted impl
    # (trace-cache safety). UNIMATCH_GRU_VCOL=<Wc> switches the vertical
    # pass to full-height column strips of Wc columns (no banded-input
    # duplication); 0 selects the row-band form. Default 16 since round-5c:
    # exact parity (same math, different grid), in-situ part of the −12.3 ms
    # flagship combo; 64/128 strips scoped-VMEM OOM (PERF_NOTES round-5a/c).
    import os

    t_override = int(os.environ.get("UNIMATCH_GRU_T", "0")) or None
    v_col = int(os.environ.get("UNIMATCH_GRU_VCOL", "16"))
    return _with_vjp(K, horizontal, t_override, v_col)(h, x, kx, khzr, kqh, bzrq)
