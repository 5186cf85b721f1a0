"""Fused windowed attention Pallas kernel.

Computes out = softmax(q k^T / sqrt(C) + bias) v per window, with the
[L, L] score tile resident in VMEM — the transformer's Swin window attention
(reference attention.py:45-163) without round-tripping fp32 score tensors
through HBM. The additive SW-MSA mask is shared across batches: window w of
batch b sits at index b*nw + w, so the bias block is indexed by (i mod nw).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_MAX_SCORE_BYTES = 12 * 1024 * 1024


def _kernel(q_ref, kt_ref, v_ref, o_ref, *, scale: float, l_real: int):
    q = q_ref[0]  # [BQ, C]
    kt = kt_ref[0]  # [C, Lp]
    v = v_ref[0]  # [Lp, C]
    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if kt.shape[1] != l_real:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < l_real, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        (p / s).astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _kernel_bias(q_ref, kt_ref, v_ref, b_ref, o_ref, *, scale: float, l_real: int):
    q = q_ref[0]
    kt = kt_ref[0]
    v = v_ref[0]
    bias = b_ref[0]  # [BQ, Lp] fp32
    scores = jax.lax.dot_general(
        q, kt, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale + bias
    if kt.shape[1] != l_real:
        col = jax.lax.broadcasted_iota(jnp.int32, scores.shape, 1)
        scores = jnp.where(col < l_real, scores, -jnp.inf)
    m = jnp.max(scores, axis=-1, keepdims=True)
    p = jnp.exp(scores - m)
    s = jnp.sum(p, axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        (p / s).astype(v.dtype), v, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
    )
    o_ref[0] = out.astype(o_ref.dtype)


def _pad_rows(x, size):
    pad = size - x.shape[1]
    return x if pad == 0 else jnp.pad(x, ((0, 0), (0, pad), (0, 0)))


def _reference(q, k, v, bias=None):
    n, _, c = q.shape
    scores = jnp.einsum("nlc,nmc->nlm", q, k, preferred_element_type=jnp.float32) / (c**0.5)
    if bias is not None:
        nw = bias.shape[0]
        scores = scores + jnp.tile(bias, (n // nw, 1, 1))
    p = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("nlm,nmc->nlc", p.astype(v.dtype), v)


@functools.lru_cache(maxsize=None)
def _with_vjp(has_bias: bool):
    """Pallas forward + jnp-reference backward (pallas_call has no autodiff)."""
    if has_bias:

        @jax.custom_vjp
        def f(q, k, v, bias):
            return _window_attention_impl(q, k, v, bias)

        def fwd(q, k, v, bias):
            return f(q, k, v, bias), (q, k, v, bias)

        def bwd(res, g):
            _, vjp = jax.vjp(_reference, *res)
            return vjp(g)

    else:

        @jax.custom_vjp
        def f(q, k, v):
            return _window_attention_impl(q, k, v, None)

        def fwd(q, k, v):
            return f(q, k, v), (q, k, v)

        def bwd(res, g):
            _, vjp = jax.vjp(lambda a, b, c_: _reference(a, b, c_), *res)
            return vjp(g)

    f.defvjp(fwd, bwd)
    return f


# ---------------------------------------------------------------------------
# Spatial (relayout-free) Swin window attention.
#
# The [N, L, C] form above needs the caller to materialize split_feature
# relayouts of q, k, v plus a k-transpose and a merge_splits — ~5 full HBM
# round-trips of the token tensor per attention call. Here the window
# decomposition is expressed directly in the BlockSpec index maps over the
# NHWC tensor: grid (B, ns, ns), block (1, H/ns, W/ns, C_packed) — the
# windows ARE blocks, so no relayout ever exists in HBM. q/k/v arrive packed
# on the channel axis (the transformer's combined projection output,
# transformer.py:61-80) and are lane-sliced in-kernel.
# ---------------------------------------------------------------------------

_SPATIAL_MAX_L = 512  # whole-window score tile must fit VMEM comfortably


def _spatial_attn(q, k, v, bias, scale, out_dtype):
    s = jax.lax.dot_general(
        q, k, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) * scale
    if bias is not None:
        s = s + bias
    m = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m)
    z = jnp.sum(p, axis=-1, keepdims=True)
    o = jax.lax.dot_general(
        (p / z).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    return o.astype(out_dtype)


def _spatial_flex_kernel(*refs, scale, c, is_cross, blocked, has_bias,
                         has_epi, fuse_res, eps=1e-5):
    """One kernel body for every spatial variant: q/k/v projection,
    windowed attention, and optionally the merge+LayerNorm(+residual)
    epilogue — the projected q/k/v, the score tile, the attention output,
    and the merge product never exist in HBM. Ref order:
    source q-rows [, kv-source whole-window] , wqkv | (wq, wkv)
    [, bias] [, merge_w, gamma, beta], out."""
    o_ref = refs[-1]
    it = iter(refs[:-1])
    x_ref = next(it)  # [1, bh, ww, C] source rows (q side)
    bh, ww = x_ref.shape[1], x_ref.shape[2]
    dt = o_ref.dtype
    xs = x_ref[0].reshape(bh * ww, c)
    if is_cross or blocked:
        w_ref = next(it)  # [1, wh, ww, C] k/v source (target when cross)
        ws = w_ref[0].reshape(w_ref.shape[1] * w_ref.shape[2], c)
    else:
        ws = xs

    def proj(a, wm):
        return jax.lax.dot_general(
            a, wm, (((1,), (0,)), ((), ())), preferred_element_type=jnp.float32
        ).astype(dt)

    if is_cross:
        wq_ref, wkv_ref = next(it), next(it)
        q = proj(xs, wq_ref[...])
        kv = proj(ws, wkv_ref[...])
    else:
        w = next(it)[...]  # [C, 3C]
        q = proj(xs, w[:, :c])
        kv = proj(ws, w[:, c:])
    k, v = kv[:, :c], kv[:, c:]

    bias = next(it)[0] if has_bias else None
    o = _spatial_attn(q, k, v, bias, scale, dt)
    if has_epi:
        # merge projection + LayerNorm (f32 stats, torch eps; same
        # convention as kernels/ffn.py)
        m_ref, g_ref, b2_ref = next(it), next(it), next(it)
        y = jax.lax.dot_general(
            o, m_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps)
        y = y * g_ref[...].astype(jnp.float32) + b2_ref[...].astype(jnp.float32)
        o = y.astype(dt)
        if fuse_res:  # residual (unshifted self layers): source rows
            o = o + xs
    o_ref[0] = o.reshape(bh, ww, c)


def _pick_row_block(wh: int, ww: int, max_l: int) -> int:
    """Largest divisor bh of wh with bh*ww <= max_l (1 worst-case)."""
    best = 1
    for bh in range(1, wh + 1):
        if wh % bh == 0 and bh * ww <= max_l:
            best = bh
    return best


@functools.partial(jax.jit, static_argnames=("num_splits", "fuse_res", "interpret"))
def _swin_spatial_impl(source, target, w1, w2, bias, merge_w, gamma, beta,
                       num_splits, fuse_res=False, interpret=False):
    """source: [B, H, W, C]. Self-attention: target None, w1 = wqkv [C, 3C],
    w2 None. Cross: target [B, H, W, C], w1 = wq [C, C], w2 = wkv [C, 2C].
    bias: [ns*ns, L, L] f32 or None. merge_w/gamma/beta: optional fused
    merge+LayerNorm epilogue; fuse_res adds the residual (self only).
    -> [B, H, W, C]."""
    b, h, w, c = source.shape
    ns = num_splits
    wh, ww = h // ns, w // ns
    l = wh * ww
    scale = 1.0 / (c**0.5)
    dt = source.dtype
    is_cross = target is not None

    single = l <= _SPATIAL_MAX_L
    bh = wh if single else _pick_row_block(wh, ww, _SPATIAL_MAX_L)
    nqb = wh // bh
    if single:
        grid = (b, ns, ns)

        def qmap(i, j, k):
            return (i, j, k, 0)

        def wmap(i, j, k):
            return (i, j, k, 0)

        def bmap(i, j, k):
            return (j * ns + k, 0, 0)

        def cmap(i, j, k):
            return (0, 0)
    else:
        grid = (b, ns, ns, nqb)

        def qmap(i, j, k, q):
            return (i, j * nqb + q, k, 0)

        def wmap(i, j, k, q):
            return (i, j, k, 0)

        def bmap(i, j, k, q):
            return (j * ns + k, q, 0)

        def cmap(i, j, k, q):
            return (0, 0)

    in_specs = [pl.BlockSpec((1, bh, ww, c), qmap, memory_space=pltpu.VMEM)]
    operands = [source]
    # whole-window k/v source: the target (cross) or the source again
    # (row-blocked self; its index map is constant in the q dim so the
    # pipeline fetches it once per window)
    if is_cross or not single:
        in_specs.append(
            pl.BlockSpec((1, wh, ww, c), wmap, memory_space=pltpu.VMEM)
        )
        operands.append(target if is_cross else source)
    if is_cross:
        in_specs += [
            pl.BlockSpec((c, c), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((c, 2 * c), cmap, memory_space=pltpu.VMEM),
        ]
        operands += [w1.astype(dt), w2.astype(dt)]
    else:
        in_specs.append(pl.BlockSpec((c, 3 * c), cmap, memory_space=pltpu.VMEM))
        operands.append(w1.astype(dt))
    if bias is not None:
        in_specs.append(
            pl.BlockSpec((1, bh * ww, l), bmap, memory_space=pltpu.VMEM)
        )
        operands.append(bias.astype(jnp.float32))
    if merge_w is not None:
        in_specs += [
            pl.BlockSpec((c, c), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cmap, memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c), cmap, memory_space=pltpu.VMEM),
        ]
        operands += [merge_w.astype(dt), gamma.reshape(1, c), beta.reshape(1, c)]

    kern = functools.partial(
        _spatial_flex_kernel, scale=scale, c=c,
        is_cross=is_cross, blocked=not single, has_bias=bias is not None,
        has_epi=merge_w is not None, fuse_res=fuse_res,
    )
    return pl.pallas_call(
        kern,
        grid=grid,
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, bh, ww, c), qmap, memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, h, w, c), dt),
        interpret=interpret,
    )(*operands)


def _swin_spatial_reference(source, target, w1, w2, bias, merge_w, gamma,
                            beta, num_splits, fuse_res=False, eps=1e-5):
    """jnp twin (same math/rounding as the kernel) via split/merge relayouts."""
    from unimatch_tpu.ops import windows as W

    b, h, w, c = source.shape
    ns = num_splits
    dt = source.dtype

    def proj(a, wm):
        return jnp.einsum("bhwc,cd->bhwd", a, wm.astype(dt),
                          preferred_element_type=jnp.float32).astype(dt)

    if target is not None:
        q = proj(source, w1)
        kv = proj(target, w2)
    else:
        q = proj(source, w1[:, :c])
        kv = proj(source, w1[:, c:])
    k, v = kv[..., :c], kv[..., c:]
    lw = (h // ns) * (w // ns)
    qs = W.split_feature(q, ns).reshape(b * ns * ns, lw, c)
    ks = W.split_feature(k, ns).reshape(b * ns * ns, lw, c)
    vs = W.split_feature(v, ns).reshape(b * ns * ns, lw, c)
    out = _reference(qs, ks, vs, bias)
    out = W.merge_splits(out.reshape(b * ns * ns, h // ns, w // ns, c), ns)
    if merge_w is not None:
        y = jnp.einsum("bhwc,cd->bhwd", out, merge_w.astype(dt),
                       preferred_element_type=jnp.float32)
        mean = jnp.mean(y, axis=-1, keepdims=True)
        var = jnp.mean(jnp.square(y - mean), axis=-1, keepdims=True)
        y = (y - mean) * jax.lax.rsqrt(var + eps)
        y = y * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
        out = y.astype(dt)
        if fuse_res:
            out = out + source
    return out


@functools.lru_cache(maxsize=None)
def _swin_spatial_with_vjp(num_splits: int, fuse_res: bool):
    @jax.custom_vjp
    def f(source, target, w1, w2, bias, merge_w, gamma, beta):
        return _swin_spatial_impl(source, target, w1, w2, bias, merge_w,
                                  gamma, beta, num_splits, fuse_res=fuse_res)

    def fwd(*args):
        return f(*args), args

    def bwd(res, ct):
        live = [i for i, a in enumerate(res) if a is not None]

        def g(*live_args):
            full = list(res)
            for i, a in zip(live, live_args):
                full[i] = a
            return _swin_spatial_reference(*full, num_splits, fuse_res=fuse_res)

        _, vjp = jax.vjp(g, *[res[i] for i in live])
        cts = vjp(ct)
        out = [None] * len(res)
        for i, cv in zip(live, cts):
            out[i] = cv
        return tuple(out)

    f.defvjp(fwd, bwd)
    return f


def swin_spatial_supported(h: int, w: int, c: int, num_splits: int,
                           dtype) -> bool:
    """Whether the spatial kernel's VMEM budget covers this window shape:
    whole-window k/v (projected, 2C wide) + a <=512-row score tile."""
    ns = num_splits
    if (h % ns) or (w % ns):
        return False
    # Mosaic block alignment: window blocks are (1, wh, ww, C) slices of the
    # NHWC map, so the last two block dims (ww, C) must be 8/128-divisible.
    # GMStereo's 384x1248 windows (312/8 = 39, 156/2 = 78 cols) fail this
    # and MUST fall back to the split form — the unaligned block crashed the
    # real Mosaic compile (round-4d); CPU tests cannot catch this class.
    if (w // ns) % 8 or c % 128:
        return False
    l = (h // ns) * (w // ns)
    kv_bytes = l * 2 * c * jnp.dtype(dtype).itemsize
    return l <= 4096 and kv_bytes <= 6 * 1024 * 1024


def swin_layer_attention_spatial(source: jnp.ndarray,
                                 target: jnp.ndarray | None,
                                 w1: jnp.ndarray, w2: jnp.ndarray | None,
                                 num_splits: int,
                                 bias: jnp.ndarray | None = None,
                                 epilogue=None, fuse_res: bool = False,
                                 interpret: bool = False) -> jnp.ndarray:
    """Relayout-free Swin window attention on NHWC source features, with
    the q/k/v projections computed per window block in-kernel.

    Self-attention: target None, w1 = packed wqkv [C, 3C], w2 None.
    Cross: target [B, H, W, C], w1 = wq [C, C], w2 = packed wkv [C, 2C].
    bias: optional [ns*ns, L, L] additive mask (L = (H/ns)*(W/ns)).
    epilogue: optional (merge_w [C, C], gamma [C], beta [C]) fusing the
    merge projection + LayerNorm; fuse_res additionally adds the residual
    in-kernel (only when no roll-back separates attention from the
    residual). Shifted windows are the caller's job (roll source/target in,
    roll the output back). Returns [B, H, W, C]. Falls back to the jnp twin
    on CPU or when the window exceeds the VMEM budget.
    """
    b, h, w, c = source.shape
    ns = num_splits
    merge_w = gamma = beta = None
    if epilogue is not None:
        merge_w, gamma, beta = epilogue
    else:
        assert not fuse_res
    if not swin_spatial_supported(h, w, c, ns, source.dtype) or (
        jax.default_backend() == "cpu" and not interpret
    ):
        return _swin_spatial_reference(source, target, w1, w2, bias, merge_w,
                                       gamma, beta, ns, fuse_res=fuse_res)
    if interpret:
        return _swin_spatial_impl(source, target, w1, w2, bias, merge_w,
                                  gamma, beta, ns, fuse_res=fuse_res,
                                  interpret=True)
    return _swin_spatial_with_vjp(ns, fuse_res)(
        source, target, w1, w2, bias, merge_w, gamma, beta
    )


def window_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                     bias: jnp.ndarray | None = None,
                     interpret: bool = False) -> jnp.ndarray:
    """Per-window attention. q,k,v: [N, L, C]; bias: [nw, L, L] fp32 with
    nw | N (window w of batch b at index b*nw + w). Returns [N, L, C]."""
    l = q.shape[1]
    block_q = min(512, -(-l // 128) * 128)
    lp = -(-l // 128) * 128

    if block_q * lp * 4 > _MAX_SCORE_BYTES or (jax.default_backend() == "cpu" and not interpret):
        return _reference(q, k, v, bias)
    if interpret:
        return _window_attention_impl(q, k, v, bias, interpret=True)
    if bias is None:
        return _with_vjp(False)(q, k, v)
    return _with_vjp(True)(q, k, v, bias)


@functools.partial(jax.jit, static_argnames=("interpret",))
def _window_attention_impl(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray,
                           bias: jnp.ndarray | None = None,
                           interpret: bool = False) -> jnp.ndarray:
    n, l, c = q.shape
    scale = 1.0 / (c**0.5)
    block_q = min(512, -(-l // 128) * 128)
    lp = -(-l // 128) * 128
    lqp = -(-l // block_q) * block_q

    qp = _pad_rows(q, lqp)
    ktp = jnp.swapaxes(_pad_rows(k, lp), 1, 2)
    vp = _pad_rows(v, lp)

    grid = (n, lqp // block_q)
    common_specs = [
        pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, c, lp), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, lp, c), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
    ]
    out_spec = pl.BlockSpec((1, block_q, c), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM)
    out_shape = jax.ShapeDtypeStruct((n, lqp, c), q.dtype)

    if bias is None:
        out = pl.pallas_call(
            functools.partial(_kernel, scale=scale, l_real=l),
            grid=grid, in_specs=common_specs, out_specs=out_spec, out_shape=out_shape,
            interpret=interpret,
        )(qp, ktp, vp)
    else:
        nw = bias.shape[0]
        bp = jnp.pad(
            bias.astype(jnp.float32), ((0, 0), (0, lqp - l), (0, lp - l))
        )
        bias_spec = pl.BlockSpec(
            (1, block_q, lp), lambda i, j: (i % nw, j, 0), memory_space=pltpu.VMEM
        )
        out = pl.pallas_call(
            functools.partial(_kernel_bias, scale=scale, l_real=l),
            grid=grid, in_specs=common_specs + [bias_spec], out_specs=out_spec,
            out_shape=out_shape, interpret=interpret,
        )(qp, ktp, vp, bp)

    return out[:, :l]
