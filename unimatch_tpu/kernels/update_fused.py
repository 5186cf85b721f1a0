"""Fused refine update-step Pallas kernels (three calls per iteration).

The refine loop's update net (reference unimatch/reg_refine.py:56-119:
BasicMotionEncoder -> SepConvGRU -> FlowHead) by default runs as FOUR
pallas_calls per iteration (motion, GRU horizontal, GRU vertical, + the XLA
flow head) with the motion features, the GRU x-concat, and the mid-GRU
hidden state each round-tripping HBM between them. In-situ the update net
is ~19 ms of the 56 ms flagship forward (docs/PERF_NOTES.md round-4d stage
breakdown) against a ~1 ms compute bound. Here the step is THREE kernels:

  kernel A:  motion-encoder conv chain + GRU horizontal (1xK) pass
             -> h1, motflow                (band halo: motion's +-2 rows)
  kernel B1: GRU vertical (Kx1) pass      (band halo: 2*pr = +-4)
             -> h'
  head:      kernels/head_fused.py on h'  (existing, compiles on chip)

The round-4g two-kernel form (head folded into the vertical pass, halo
+-6, four 128-lane banded inputs) exceeded Mosaic's 16 MB scoped-VMEM
limit at every T (21.03 MB at T=8, 18.09 at T=4 — the banded input blocks
double-buffer and dominate). B1 instead has exactly the proven
gru_fused._vkernel footprint: same halo, same gate temps, and the same
input bytes (3 x 128 lanes here vs its 256-lane x concat + 128-lane h).

Design notes:
* Kernel A is kernels/motion_fused.py's band layout (im2col'd 7x7, packed
  256-lane corr|flow input, zero-masked intermediates) with
  kernels/gru_fused.py's _hkernel appended — the motion band's +-2 pad
  columns double as the K=5 'same' conv's pr=2 column padding.
* The GRU x input is NEVER concatenated, and costs no wasted dot work:
  the reference's x layout is [inp(hd) | motion(hd-fd) | flow(fd)], so
  packing flow into the motion map's zero tail lanes ("motflow") makes the
  second 128-lane part line up with kx[:, hd:] VERBATIM — two full-rank
  [K, 128, 3*hd] dots per tap, no zero-extended rows, no in-kernel
  lane-concat (a Mosaic rejection, CLAUDE.md). The caller frames flow into
  tail lanes (zeros elsewhere) and kernel A forms motflow = motion + that
  frame (motion's tail fd lanes are zero by construction).
* Tap accumulation f32, one rounding per conv; gate math f32 on rounded
  sums; rounded conv sums are HELD in the compute dtype (the rounding
  already happened, so dt storage is numerically identical and halves the
  gate-temp VMEM) — matches the separate fused kernels it replaces up to
  f32 dot-split accumulation order.

pallas_call has no autodiff: training runs the jnp twin's vjp (custom_vjp);
in practice the dispatch only covers the inference path (with_mask=False).

Reference for what this implements: unimatch/reg_refine.py:56-119 (update
block), matching the TPU decomposition in models/reg_refine.py.
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

_HALO_A = 2  # motion chain: stage-2 3x3 + merge 3x3 (7x7 folded via im2col)
_PR = 2  # GRU K=5 'same' padding radius
_HALO_B = 2 * _PR  # vertical q-chain halo (head runs in its own kernel)
_K = 5


def _band_rows(nt: int, T: int, halo2: int) -> jnp.ndarray:
    return (
        jnp.arange(nt, dtype=jnp.int32)[:, None] * T
        + jnp.arange(T + halo2, dtype=jnp.int32)[None, :]
    )


def _mask3(rows, width, row0_global, col0, W, H, dt):
    """[rows, width, 1] 0/1 mask of the valid image box; iotas 3-D from the
    start (Mosaic: no minor-dim insertion on non-32-bit vectors)."""
    gr = jax.lax.broadcasted_iota(jnp.int32, (rows, width, 1), 0) + row0_global
    gc = jax.lax.broadcasted_iota(jnp.int32, (rows, width, 1), 1)
    ok = (gr >= 0) & (gr < H) & (gc >= col0) & (gc < col0 + W)
    return ok.astype(dt)


def _conv_band(src, nrows, w_ref, bias, K, rows_out, row0, src_row0, act):
    """KxK 'same' conv + bias (+ relu) at band rows [row0, row0+rows_out).

    src [nrows, Wp, cin] covers band rows [src_row0, ...). Horizontal taps
    shift via zero-filled pad/slice of the tap partial (equivalent to zero
    column padding as long as src is already zero outside the image).
    cout chunked at 128 to bound the f32 tap partial. Returns f32
    [rows_out, Wp, cout].
    """
    cin = src.shape[-1]
    Wp = src.shape[-2]
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
                    sl = jax.lax.slice(
                        jnp.pad(sl, ((0, 0), (pr, pr), (0, 0))),
                        (0, v, 0), (rows_out, v + Wp, c1 - c0),
                    )
                acc = sl if acc is None else acc + sl
        acc = acc + bias[c0:c1].astype(jnp.float32)
        if act:
            acc = jnp.maximum(acc, 0.0)
        outs.append(acc)
    return outs[0] if len(outs) == 1 else jnp.concatenate(outs, axis=-1)


# --------------------------------------------------------------------------
# kernel A: motion encoder + GRU horizontal pass
# --------------------------------------------------------------------------


def _kernel_a(x_ref, flow_ref, inp_ref, h_ref, wc1_ref, wf1_ref, wc2_ref,
              wf2_ref, wm_ref, mb_ref, kxi_ref, kxm_ref, khzr_ref,
              kqh_ref, gb_ref, oh_ref, omf_ref, *, T, W, H, fd, hd, dt):
    """x (corr|flow-im2col pack) [1,1,T+4,Wp,256]; flow (TAIL lanes
    128-fd..127, zeros elsewhere) / inp / h [1,T,Wp,*]; oh (post-horizontal
    h) [1,T,W,hd]; omf (motflow = motion with flow riding its zero tail
    lanes) [1,T,W,128].

    Band row r is global row j*T + r - 2; padded columns [2, 2+W) are the
    image (the motion frame's +-2 columns double as the K=5 pr=2 padding).
    """
    j = pl.program_id(1)
    xb = x_ref[0, 0]
    Tb, Wp, _ = xb.shape

    def mask(rows, row0):
        return _mask3(rows, Wp, j * T + row0 - _HALO_A, _HALO_A, W, H, dt)

    bc1 = mb_ref[0, 0]
    bf1 = mb_ref[0, 1, :128]
    bc2 = mb_ref[0, 2, :192]
    bf2 = mb_ref[0, 3, :64]
    bm = mb_ref[0, 4, :128]  # zero-extended 128-fd -> 128

    # ---- motion encoder (same chain as kernels/motion_fused.py) ----
    m1 = mask(Tb, 0)
    cor1 = _conv_band(xb, Tb, wc1_ref, bc1, 1, Tb, 0, 0, True).astype(dt) * m1
    flo1 = _conv_band(xb, Tb, wf1_ref, bf1, 1, Tb, 0, 0, True).astype(dt) * m1
    m2 = mask(T + 2, 1)
    cor2 = _conv_band(cor1, Tb, wc2_ref, bc2, 3, T + 2, 1, 0, True).astype(dt) * m2
    flo2 = _conv_band(flo1, Tb, wf2_ref, bf2, 3, T + 2, 1, 0, True).astype(dt) * m2
    merged = jnp.concatenate([cor2, flo2], axis=-1)  # [T+2, Wp, 256]
    m3 = mask(T, 2)
    motion = (
        _conv_band(merged, T + 2, wm_ref, bm, 3, T, 2, 1, True).astype(dt) * m3
    )  # [T, Wp, 128]; lanes >= 128-fd are zero (zero-extended wm/bias)
    # flow rides the zero tail lanes: motflow == the reference's
    # [motion | flow] slice of the x concat, so kx[:, hd:] applies verbatim
    motflow = motion + flow_ref[0]

    # ---- GRU horizontal (1xK) pass, gru_fused._hkernel logic; the x input
    # [inp | motion | flow] stays two full-rank 128-lane dots ----
    inpf = inp_ref[0].reshape(T * Wp, hd)
    mff = motflow.reshape(T * Wp, 128)
    hf = h_ref[0].reshape(T * Wp, hd)
    xparts = ((inpf, kxi_ref), (mff, kxm_ref))

    def conv_w(parts, off):
        acc = None
        for k in range(_K):
            for flat, w_ref in parts:
                part = jax.lax.dot_general(
                    flat, w_ref[k, :, off : off + hd],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ).reshape(T, Wp, hd)
                sl = jax.lax.slice(part, (0, k, 0), (T, k + W, hd))
                acc = sl if acc is None else acc + sl
        return acc

    # rounded conv sums are HELD in dt and upcast at the use site — the
    # rounding through dt already happened, so this is numerically identical
    # to f32 storage and halves the kernel's scoped-VMEM footprint
    xz = conv_w(xparts, 0).astype(dt)
    xr = conv_w(xparts, hd).astype(dt)
    xq = conv_w(xparts, 2 * hd).astype(dt)
    hz = conv_w(((hf, khzr_ref),), 0).astype(dt)
    hr = conv_w(((hf, khzr_ref),), hd).astype(dt)

    f32 = jnp.float32
    z = jax.nn.sigmoid(hz.astype(f32) + xz.astype(f32) + gb_ref[0, 0].astype(f32))
    r = jax.nn.sigmoid(hr.astype(f32) + xr.astype(f32) + gb_ref[0, 1].astype(f32))
    hc = jax.lax.slice(h_ref[0], (0, _PR, 0), (T, _PR + W, hd))
    rhp = jnp.pad((r * hc.astype(f32)).astype(dt), ((0, 0), (_PR, Wp - W - _PR), (0, 0)))
    qh = conv_w(((rhp.reshape(T * Wp, hd), kqh_ref),), 0).astype(dt)
    q = jnp.tanh(qh.astype(f32) + xq.astype(f32) + gb_ref[0, 2].astype(f32))

    oh_ref[0] = ((1.0 - z) * hc.astype(f32) + z * q).astype(oh_ref.dtype)
    omf_ref[0] = jax.lax.slice(motflow, (0, _HALO_A, 0), (T, _HALO_A + W, 128)).astype(
        omf_ref.dtype
    )


# --------------------------------------------------------------------------
# kernel B1: GRU vertical pass (head runs in kernels/head_fused.py)
# --------------------------------------------------------------------------


def _kernel_b1(inp_ref, mf_ref, h_ref, kxi_ref, kxm_ref, khzr_ref, kqh_ref,
               gb_ref, oh_ref, *, T, hd, dt):
    """Banded inputs [1,1,T+8,Wv,*] (halo 2*pr = 4 rows each side;
    Wv = align8(W), zero beyond the image). oh (h') [1,T,Wv,hd]. Band row r
    is global j*T + r - 4. Footprint == gru_fused._vkernel (which compiles
    and runs at these shapes): same halo, same gate temps, same input bytes.
    """
    Tb = inp_ref.shape[2]
    Wv = inp_ref.shape[3]
    Ti = T + 2 * _PR  # rows where z/r/(r*h) are needed: [-2, T+2)

    inpf = inp_ref[0, 0].reshape(Tb * Wv, hd)
    mff = mf_ref[0, 0].reshape(Tb * Wv, 128)
    hf = h_ref[0, 0].reshape(Tb * Wv, hd)
    xparts = ((inpf, kxi_ref), (mff, kxm_ref))

    def conv_rows(parts, nrows, off, rows_out, row0):
        """Kx1 'same' conv at band rows [row0, row0+rows_out)."""
        acc = None
        for k in range(_K):
            for flat, w_ref in parts:
                part = jax.lax.dot_general(
                    flat, w_ref[k, :, off : off + hd],
                    (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32,
                ).reshape(nrows, Wv, hd)
                sl = jax.lax.slice(
                    part, (row0 - _PR + k, 0, 0), (row0 - _PR + k + rows_out, Wv, hd)
                )
                acc = sl if acc is None else acc + sl
        return acc

    # rounded conv sums held in dt, upcast at use (identical numerics,
    # ~half the scoped-VMEM footprint — see kernel A)
    xz = conv_rows(xparts, Tb, 0, Ti, _PR).astype(dt)
    xr = conv_rows(xparts, Tb, hd, Ti, _PR).astype(dt)
    hz = conv_rows(((hf, khzr_ref),), Tb, 0, Ti, _PR).astype(dt)
    hr = conv_rows(((hf, khzr_ref),), Tb, hd, Ti, _PR).astype(dt)

    f32 = jnp.float32
    hi = jax.lax.slice(h_ref[0, 0], (_PR, 0, 0), (_PR + Ti, Wv, hd))
    z_i = jax.nn.sigmoid(hz.astype(f32) + xz.astype(f32) + gb_ref[0, 0].astype(f32))
    r_i = jax.nn.sigmoid(hr.astype(f32) + xr.astype(f32) + gb_ref[0, 1].astype(f32))
    rh = (r_i * hi.astype(f32)).astype(dt)  # [Ti, Wv, hd]; rh row i == band row i + 2

    # q at band rows [2, T+2) == rh rows [2, T+2)
    qh = conv_rows(((rh.reshape(Ti * Wv, hd), kqh_ref),), Ti, 0, T, _PR).astype(dt)
    xq = conv_rows(xparts, Tb, 2 * hd, T, 2 * _PR).astype(dt)
    q = jnp.tanh(qh.astype(f32) + xq.astype(f32) + gb_ref[0, 2].astype(f32))

    z_c = jax.lax.slice(z_i, (_PR, 0, 0), (_PR + T, Wv, hd))
    h_c = jax.lax.slice(hi, (_PR, 0, 0), (_PR + T, Wv, hd))
    oh_ref[0] = ((1.0 - z_c) * h_c.astype(f32) + z_c * q).astype(oh_ref.dtype)


# --------------------------------------------------------------------------
# driver
# --------------------------------------------------------------------------


def _pick_t(default: int = 8) -> int:
    return int(os.environ.get("UNIMATCH_UPDATE_T", str(default)))


def _split_kx(kx, hd, dt):
    """[K, 2*hd, 3*hd] x-side GRU weights -> two [K, 128, 3*hd] mats for the
    (inp, motflow) parts. The reference x layout is [inp | motion | flow]
    with motion+flow together exactly hd channels, and motflow packs flow
    into the motion map's zero tail lanes — so the second slice applies
    VERBATIM, no reordering or zero-extension."""
    kx = kx.reshape(_K, 2 * hd, 3 * hd).astype(dt)
    return kx[:, :hd], kx[:, hd:]


@functools.partial(jax.jit, static_argnames=("fd", "T", "interpret"))
def _fused_update_impl(net, inp, corr, flow, mw, mb, g1, g2, hk1, hb1, hk2, hb2,
                       fd, T, interpret):
    """One full update step. mw = (wc1, wc2, wf1, wf2, wm); mb = 5 biases;
    g1/g2 = (kx, khzr, kqh, bzrq) horizontal/vertical; hk/hb = head convs.
    T is a STATIC arg (band rows): reading the env var inside the jitted
    body would be frozen into the first-traced graph and a later env change
    would silently replay it (the round-4g T=8/T=4 retries compiled the
    identical 21 MB-scoped graph twice)."""
    b, h, w, hd = net.shape
    ck = corr.shape[-1]
    dt = net.dtype
    wc1, wc2, wf1, wf2, wm = mw
    kx1, khzr1, kqh1, bz1 = g1
    kx2, khzr2, kqh2, bz2 = g2

    hp = -(-h // T) * T
    wp = -(-(w + 2 * _HALO_A) // 8) * 8
    nt = hp // T

    # ---- kernel A inputs: motion pack (corr | flow im2col), flow, inp, h ----
    fpad = jnp.pad(flow, ((0, 0), (3, 3), (3, 3), (0, 0)))
    fim = jnp.concatenate(
        [fpad[:, u : u + h, v : v + w, :] for u in range(7) for v in range(7)],
        axis=-1,
    )
    x = jnp.concatenate(
        [
            jnp.pad(corr, ((0, 0), (0, 0), (0, 0), (0, 128 - ck))),
            jnp.pad(fim, ((0, 0), (0, 0), (0, 0), (0, 128 - 49 * fd))),
        ],
        axis=-1,
    )
    x = jnp.pad(
        x, ((0, 0), (_HALO_A, hp - h + _HALO_A), (_HALO_A, wp - w - _HALO_A), (0, 0))
    )
    xb = jnp.take(x, _band_rows(nt, T, 2 * _HALO_A), axis=1)

    def frame(t, tail=False):
        # [B, hp, wp, 128] with the +-2 column frame, zero outside; tail=True
        # parks the channels on lanes 128-c..127 (flow's motflow slot)
        c = t.shape[-1]
        lanes = (128 - c, 0) if tail else (0, 128 - c)
        t = jnp.pad(t, ((0, 0),) * 3 + (lanes,))
        return jnp.pad(
            t, ((0, 0), (0, hp - h), (_HALO_A, wp - w - _HALO_A), (0, 0))
        ).astype(dt)

    flow_f = frame(flow, tail=True)
    inp_f = frame(inp)
    h_f = frame(net)

    wc1m = jnp.zeros((256, 256), dt).at[:ck].set(wc1.reshape(ck, 256).astype(dt))
    wf1m = (
        jnp.zeros((256, 128), dt)
        .at[128 : 128 + 49 * fd]
        .set(wf1.reshape(49 * fd, 128).astype(dt))
    )
    wmm = jnp.pad(wm.reshape(9, 256, 128 - fd), ((0, 0), (0, 0), (0, fd))).astype(dt)
    mbm = jnp.zeros((1, 5, 256), dt)
    for i, bias in enumerate(mb):
        mbm = mbm.at[0, i, : bias.shape[0]].set(bias.astype(dt))

    kxi1, kxm1 = _split_kx(kx1, hd, dt)
    khzr1m = khzr1.reshape(_K, hd, 2 * hd).astype(dt)
    kqh1m = kqh1.reshape(_K, hd, hd).astype(dt)
    gb1 = bz1.reshape(1, 3, hd).astype(dt)

    h1, mf = pl.pallas_call(
        functools.partial(_kernel_a, T=T, W=w, H=h, fd=fd, hd=hd, dt=dt),
        grid=(b, nt),
        in_specs=[
            pl.BlockSpec((1, 1, T + 2 * _HALO_A, wp, 256), lambda i, j: (i, j, 0, 0, 0)),
            pl.BlockSpec((1, T, wp, 128), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, T, wp, 128), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, T, wp, 128), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, 256, 256), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 256, 128), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((9, 256, 192), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((9, 128, 64), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((9, 256, 128), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 5, 256), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((_K, 128, 3 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((_K, 128, 3 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((_K, hd, 2 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((_K, hd, hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 3, hd), lambda i, j: (0, 0, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, T, w, hd), lambda i, j: (i, j, 0, 0)),
            pl.BlockSpec((1, T, w, 128), lambda i, j: (i, j, 0, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, hp, w, hd), dt),
            jax.ShapeDtypeStruct((b, hp, w, 128), dt),
        ],
        interpret=interpret,
    )(
        xb.astype(dt), flow_f, inp_f, h_f,
        wc1m.reshape(1, 256, 256), wf1m.reshape(1, 256, 128),
        wc2.reshape(9, 256, 192).astype(dt), wf2.reshape(9, 128, 64).astype(dt),
        wmm, mbm, kxi1, kxm1, khzr1m, kqh1m, gb1,
    )

    # ---- kernel B1: banded inp / motflow / h1 with a 2*pr-row halo ----
    wv = -(-w // 8) * 8
    halo = _HALO_B
    rows_b = _band_rows(nt, T, 2 * halo)

    def band(t):
        t = jnp.pad(t[:, :h, :w], ((0, 0),) * 3 + ((0, 128 - t.shape[-1]),))
        tp = jnp.pad(t, ((0, 0), (halo, hp - h + halo), (0, wv - w), (0, 0)))
        return jnp.take(tp, rows_b, axis=1).astype(dt)

    inp_b = band(inp)
    mf_b = band(mf)
    h1_b = band(h1)

    kxi2, kxm2 = _split_kx(kx2, hd, dt)
    khzr2m = khzr2.reshape(_K, hd, 2 * hd).astype(dt)
    kqh2m = kqh2.reshape(_K, hd, hd).astype(dt)
    gb2 = bz2.reshape(1, 3, hd).astype(dt)

    bspec = lambda c: pl.BlockSpec((1, 1, T + 2 * halo, wv, c), lambda i, j: (i, j, 0, 0, 0))
    h2 = pl.pallas_call(
        functools.partial(_kernel_b1, T=T, hd=hd, dt=dt),
        grid=(b, nt),
        in_specs=[
            bspec(hd), bspec(128), bspec(hd),
            pl.BlockSpec((_K, 128, 3 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((_K, 128, 3 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((_K, hd, 2 * hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((_K, hd, hd), lambda i, j: (0, 0, 0)),
            pl.BlockSpec((1, 3, hd), lambda i, j: (0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, T, wv, hd), lambda i, j: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((b, hp, wv, hd), dt),
        interpret=interpret,
    )(inp_b, mf_b, h1_b, kxi2, kxm2, khzr2m, kqh2m, gb2)

    h2 = h2[:, :h, :w]

    # ---- flow head: the existing fused two-conv kernel (on-chip parity
    # 0.031 on 12.75 absmax, docs/PERF_NOTES.md round-4d) ----
    from unimatch_tpu.kernels.head_fused import fused_head

    delta = fused_head(h2, hk1, hb1, hk2, hb2, act1="relu", interpret=interpret)
    return h2, delta


def _reference_update(net, inp, corr, flow, mw, mb, g1, g2, hk1, hb1, hk2, hb2, fd):
    """Differentiable jnp twin: the exact composition of the three fused
    kernels this module replaces (motion twin + two GRU-pass twins + the
    fused-head twin)."""
    from unimatch_tpu.kernels.gru_fused import _reference_gru_pass
    from unimatch_tpu.kernels.head_fused import _reference_head
    from unimatch_tpu.kernels.motion_fused import _reference_motion

    wc1, wc2, wf1, wf2, wm = mw
    motion = _reference_motion(corr, flow, wc1, wc2, wf1, wf2, wm, tuple(mb), fd)
    x = jnp.concatenate([inp, motion, flow], axis=-1)
    h1 = _reference_gru_pass(net, x, *g1, _K, True)
    h2 = _reference_gru_pass(h1, x, *g2, _K, False)
    delta = _reference_head(h2, hk1, hb1, hk2, hb2, 3, 3, 3, 3, "relu")
    return h2, delta


@functools.lru_cache(maxsize=None)
def _with_vjp(fd: int, T: int):
    @jax.custom_vjp
    def f(net, inp, corr, flow, mw, mb, g1, g2, hk1, hb1, hk2, hb2):
        return _fused_update_impl(
            net, inp, corr, flow, mw, mb, g1, g2, hk1, hb1, hk2, hb2, fd, T, False
        )

    def fwd(*args):
        return f(*args), args

    def bwd(res, g):
        _, vjp = jax.vjp(lambda *a: _reference_update(*a, fd), *res)
        return vjp(g)

    f.defvjp(fwd, bwd)
    return f


def fused_update(
    net: jnp.ndarray,  # [B, H, W, 128] GRU hidden
    inp: jnp.ndarray,  # [B, H, W, 128] context (loop-invariant)
    corr: jnp.ndarray,  # [B, H, W, <= 128] lookup output
    flow: jnp.ndarray,  # [B, H, W, fd]
    mw,  # (wc1, wc2, wf1, wf2, wm) motion-encoder conv kernels
    mb,  # (bc1, bf1, bc2, bf2, bm) motion-encoder biases (b_ref layout)
    g1,  # (kx, khzr, kqh, bzrq) horizontal GRU pass
    g2,  # vertical GRU pass
    hk1, hb1, hk2, hb2,  # FlowHead convs
    interpret: bool = False,
):
    """One refine update step (motion -> GRU -> head) in two Pallas calls.

    Returns (net', delta). Values match the chain of the separate fused
    kernels (motion_fused + gru_fused x2 + head_fused) up to f32 dot-split
    accumulation order; vs the unfused XLA form differences are bf16
    elementwise rounding.
    """
    fd = flow.shape[-1]
    mw, mb, g1, g2 = tuple(mw), tuple(mb), tuple(g1), tuple(g2)
    T = _pick_t()  # read HERE (trace time), never inside the jitted impl
    if jax.default_backend() == "cpu" and not interpret:
        return _reference_update(net, inp, corr, flow, mw, mb, g1, g2,
                                 hk1, hb1, hk2, hb2, fd)
    if interpret:
        return _fused_update_impl(net, inp, corr, flow, mw, mb, g1, g2,
                                  hk1, hb1, hk2, hb2, fd, T, True)
    return _with_vjp(fd, T)(net, inp, corr, flow, mw, mb, g1, g2, hk1, hb1, hk2, hb2)
