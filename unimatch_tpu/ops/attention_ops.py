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


def swin_attention_packed(
    q_or_qkv: jnp.ndarray,
    kv: Optional[jnp.ndarray],
    num_splits: int,
    with_shift: bool,
    h: int,
    w: int,
    attn_mask: Optional[jnp.ndarray] = None,
    epilogue=None,
    residual_source: Optional[jnp.ndarray] = None,
) -> jnp.ndarray:
    """Swin shifted-window 2D attention on channel-packed projections —
    relayout-free on TPU. Same values as split_window_attention; reference
    attention.py:45-104.

    q_or_qkv: [B, H*W, 3C] packed qkv (self-attention, kv=None) or
    [B, H*W, C] query with kv: [B, H*W, 2C] packed key/value (cross). The
    window split/merge runs inside the Pallas kernel's BlockSpec index maps
    (kernels/window_attention.py::swin_attention_spatial), so the
    split_feature/merge_splits HBM relayouts of the [N, L, C] form never
    exist; for shifted windows a single roll of each packed input replaces
    the three per-tensor rolls.

    epilogue: optional (merge_w, gamma, beta) — fuses the transformer
    layer's merge projection + LayerNorm into the kernel (merge and LN are
    per-token channel maps, so they commute with the shift roll-back).
    residual_source: [B, H*W, C] adds the layer residual in-kernel too —
    only valid for unshifted calls (the residual must be added in unrolled
    coordinates; shifted callers add it after the roll-back).
    """
    b, l, cp = q_or_qkv.shape
    assert l == h * w
    x = q_or_qkv.reshape(b, h, w, cp)
    kv4 = kv.reshape(b, h, w, kv.shape[-1]) if kv is not None else None
    src4 = None
    if residual_source is not None:
        assert not with_shift and epilogue is not None
        src4 = residual_source.reshape(b, h, w, residual_source.shape[-1])
    if with_shift:
        assert attn_mask is not None
        sh, sw = (h // num_splits) // 2, (w // num_splits) // 2
        x = jnp.roll(x, shift=(-sh, -sw), axis=(1, 2))
        if kv4 is not None:
            kv4 = jnp.roll(kv4, shift=(-sh, -sw), axis=(1, 2))

    from unimatch_tpu.kernels.window_attention import swin_attention_spatial

    out = swin_attention_spatial(
        x, kv4, num_splits, bias=attn_mask if with_shift else None,
        epilogue=epilogue, src=src4,
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
