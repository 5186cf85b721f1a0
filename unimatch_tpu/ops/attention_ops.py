"""Single-head attention primitives (channels-last).

Reference semantics: unimatch/attention.py:8-163. Four variants, all
single-head scaled-dot-product (the reference deliberately keeps attention
single-head for speed — transformer.py:63-66):

  * full 2D attention over all HW tokens
  * full 1D attention per scanline (stereo cross-attention)
  * Swin-style shifted-window 2D attention
  * shifted-window 1D attention

TPU notes: window attention is expressed as batched matmuls over
[num_windows, L, C] — XLA maps these straight onto the MXU. Softmax is
computed in fp32 regardless of input dtype. A Pallas flash-attention path for
the full-2D variants lives in unimatch_tpu.kernels and is dispatched from the
model layer when token counts are large.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from unimatch_tpu.ops import windows as W


def _sdpa(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, bias: Optional[jnp.ndarray] = None) -> jnp.ndarray:
    """Scaled dot-product attention over the second-to-last axis.

    q, k, v: [..., L, C]; bias broadcastable to [..., L, L]. fp32 softmax.
    """
    c = q.shape[-1]
    scores = jnp.einsum("...lc,...mc->...lm", q, k, preferred_element_type=jnp.float32)
    scores = scores / jnp.sqrt(jnp.float32(c))
    if bias is not None:
        scores = scores + bias
    attn = jax.nn.softmax(scores, axis=-1)
    return jnp.einsum("...lm,...mc->...lc", attn.astype(v.dtype), v)


def _fused_window_attention(qs, ks, vs, mask: Optional[jnp.ndarray]):
    """Dispatch [N, L, C] windowed attention to the Pallas kernel when
    profitable (TPU, L large enough to beat dispatch overheads)."""
    from unimatch_tpu.kernels import use_pallas

    n, l, c = qs.shape
    if use_pallas() and l >= 256 and c % 128 == 0:
        from unimatch_tpu.kernels.window_attention import window_attention

        return window_attention(qs, ks, vs, bias=mask)
    bias = None
    if mask is not None:
        bias = jnp.tile(mask, (n // mask.shape[0], 1, 1))
    return _sdpa(qs, ks, vs, bias=bias)


def full_attention(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """[B, L, C] full 2D attention. Reference attention.py:8-16."""
    return _fused_window_attention(q, k, v, None)


def full_attention_1d(q: jnp.ndarray, k: jnp.ndarray, v: jnp.ndarray, h: int, w: int) -> jnp.ndarray:
    """Per-scanline 1D attention for stereo. q,k,v: [B, H*W, C]. Reference attention.py:19-42."""
    b, l, c = q.shape
    assert l == h * w
    qr = q.reshape(b, h, w, c)
    kr = k.reshape(b, h, w, c)
    vr = v.reshape(b, h, w, c)
    out = _sdpa(qr, kr, vr)
    return out.reshape(b, l, c)


def split_window_attention(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_splits: int,
    with_shift: bool,
    h: int,
    w: int,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Swin shifted-window 2D attention. q,k,v: [B, H*W, C]. Reference attention.py:45-104."""
    b, l, c = q.shape
    assert l == h * w
    ws_h, ws_w = h // num_splits, w // num_splits

    qr = q.reshape(b, h, w, c)
    kr = k.reshape(b, h, w, c)
    vr = v.reshape(b, h, w, c)

    if with_shift:
        assert attn_mask is not None
        sh, sw = ws_h // 2, ws_w // 2
        qr = jnp.roll(qr, shift=(-sh, -sw), axis=(1, 2))
        kr = jnp.roll(kr, shift=(-sh, -sw), axis=(1, 2))
        vr = jnp.roll(vr, shift=(-sh, -sw), axis=(1, 2))

    nw = num_splits * num_splits
    lw = ws_h * ws_w
    qs = W.split_feature(qr, num_splits).reshape(b * nw, lw, c)
    ks = W.split_feature(kr, num_splits).reshape(b * nw, lw, c)
    vs = W.split_feature(vr, num_splits).reshape(b * nw, lw, c)

    out = _fused_window_attention(qs, ks, vs, attn_mask if with_shift else None)

    out = W.merge_splits(out.reshape(b * nw, ws_h, ws_w, c), num_splits)
    if with_shift:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out.reshape(b, l, c)


def swin_layer_attention(
    source: jnp.ndarray,
    target: Optional[jnp.ndarray],
    w1: jnp.ndarray,
    w2: Optional[jnp.ndarray],
    num_splits: int,
    with_shift: bool,
    h: int,
    w: int,
    attn_mask: Optional[jnp.ndarray] = None,
    epilogue=None,
    fuse_res: bool = False,
) -> jnp.ndarray:
    """Swin shifted-window 2D attention computed straight from the layer's
    source/target features — relayout-free on TPU. Same values as
    projection + split_window_attention; reference attention.py:45-104.

    source: [B, H*W, C]; self-attention passes target=None with w1 = packed
    wqkv [C, 3C]; cross passes target [B, H*W, C] with w1 = wq [C, C] and
    w2 = packed wkv [C, 2C]. The q/k/v projections, window split/merge,
    attention, and (optionally, via epilogue=(merge_w, gamma, beta)) the
    merge projection + LayerNorm all run inside one Pallas kernel
    (kernels/window_attention.py::swin_layer_attention_spatial) — the
    projected q/k/v and the attention output never exist in HBM. For
    shifted windows one roll of the C-wide source (and target) replaces the
    three rolls of projected tensors; fuse_res adds the layer residual
    in-kernel and is only valid unshifted (shifted callers add it after the
    roll-back — merge/LN are per-token channel maps, so they commute with
    the roll).
    """
    b, l, c = source.shape
    assert l == h * w
    x = source.reshape(b, h, w, c)
    t4 = target.reshape(b, h, w, c) if target is not None else None
    if with_shift:
        assert attn_mask is not None and not fuse_res
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))
        if t4 is not None:
            t4 = jnp.roll(t4, shift=(-sh, -sw), axis=(1, 2))

    from unimatch_tpu.kernels.window_attention import swin_layer_attention_spatial

    out = swin_layer_attention_spatial(
        x, t4, w1, w2, num_splits, bias=attn_mask if with_shift else None,
        epilogue=epilogue, fuse_res=fuse_res,
    )
    if with_shift:
        out = jnp.roll(out, shift=(sh, sw), axis=(1, 2))
    return out.reshape(b, l, out.shape[-1])


def split_window_attention_1d(
    q: jnp.ndarray,
    k: jnp.ndarray,
    v: jnp.ndarray,
    num_splits: int,
    with_shift: bool,
    h: int,
    w: int,
    attn_mask: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Shifted-window 1D (horizontal) attention. q,k,v: [B, H*W, C]. Reference attention.py:107-163."""
    b, l, c = q.shape
    assert l == h * w
    ws_w = w // num_splits

    qr = q.reshape(b * h, w, c)
    kr = k.reshape(b * h, w, c)
    vr = v.reshape(b * h, w, c)

    if with_shift:
        assert attn_mask is not None
        sw = ws_w // 2
        qr = jnp.roll(qr, shift=-sw, axis=1)
        kr = jnp.roll(kr, shift=-sw, axis=1)
        vr = jnp.roll(vr, shift=-sw, axis=1)

    qs = W.split_feature_1d(qr, num_splits).reshape(b * h, num_splits, ws_w, c)
    ks = W.split_feature_1d(kr, num_splits).reshape(b * h, num_splits, ws_w, c)
    vs = W.split_feature_1d(vr, num_splits).reshape(b * h, num_splits, ws_w, c)

    bias = attn_mask[None] if with_shift else None  # [1, K, W/K, W/K]
    out = _sdpa(qs, ks, vs, bias=bias)  # [B*H, K, W/K, C]

    out = out.reshape(b, h, w, c)
    if with_shift:
        out = jnp.roll(out, shift=sw, axis=2)
    return out.reshape(b, l, c)
