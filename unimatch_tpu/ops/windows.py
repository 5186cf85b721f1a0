"""Window partition / merge and Swin shifted-window attention masks (NHWC).

Reference semantics: unimatch/utils.py:34-81 (split/merge), :84-108 (2D SW-MSA
mask), :155-216 (1D variants). Masks are computed with numpy at trace time —
they depend only on static shapes, so they become compile-time constants.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def split_feature(feature: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """[B, H, W, C] -> [B*K*K, H/K, W/K, C], window-major row order."""
    b, h, w, c = feature.shape
    k = num_splits
    assert h % k == 0 and w % k == 0, (h, w, k)
    x = feature.reshape(b, k, h // k, k, w // k, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, K, K, H/K, W/K, C]
    return x.reshape(b * k * k, h // k, w // k, c)


def merge_splits(splits: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """[B*K*K, H/K, W/K, C] -> [B, H, W, C] (inverse of split_feature)."""
    bkk, hk, wk, c = splits.shape
    k = num_splits
    b = bkk // (k * k)
    x = splits.reshape(b, k, k, hk, wk, c)
    x = x.transpose(0, 1, 3, 2, 4, 5)  # [B, K, H/K, K, W/K, C]
    return x.reshape(b, k * hk, k * wk, c)


def split_feature_1d(feature: jnp.ndarray, num_splits: int) -> jnp.ndarray:
    """[B, W, C] -> [B*K, W/K, C]."""
    b, w, c = feature.shape
    k = num_splits
    assert w % k == 0
    return feature.reshape(b * k, w // k, c)


def merge_splits_1d(splits: jnp.ndarray, h: int, num_splits: int) -> jnp.ndarray:
    """[B*H*K, W/K, C] -> [B, H, K*(W/K), C]."""
    bhk, wk, c = splits.shape
    k = num_splits
    b = bhk // (k * h)
    return splits.reshape(b, h, k * wk, c)


@functools.lru_cache(maxsize=None)
def _shift_window_mask_np(h: int, w: int, win_h: int, win_w: int, shift_h: int, shift_w: int):
    """Swin SW-MSA additive mask, numpy. Returns [K*K, win_h*win_w, win_h*win_w] float32."""
    img_mask = np.zeros((h, w), np.float32)
    h_slices = (slice(0, -win_h), slice(-win_h, -shift_h), slice(-shift_h, None))
    w_slices = (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[hs, ws] = cnt
            cnt += 1
    k = w // win_w
    # partition into windows, window-major
    m = img_mask.reshape(h // win_h, win_h, k, win_w).transpose(0, 2, 1, 3)
    m = m.reshape(-1, win_h * win_w)  # [num_windows, win_h*win_w]
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def generate_shift_window_attn_mask(
    h: int, w: int, window_size_h: int, window_size_w: int, shift_size_h: int, shift_size_w: int
) -> jnp.ndarray:
    """Additive SW-MSA mask [num_windows, L, L]; reference utils.py:84-108."""
    return jnp.asarray(
        _shift_window_mask_np(h, w, window_size_h, window_size_w, shift_size_h, shift_size_w)
    )


@functools.lru_cache(maxsize=None)
def _shift_window_mask_1d_np(input_w: int, win_w: int, shift_w: int):
    img_mask = np.zeros((input_w,), np.float32)
    w_slices = (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None))
    cnt = 0
    for ws in w_slices:
        img_mask[ws] = cnt
        cnt += 1
    m = img_mask.reshape(-1, win_w)  # [K, win_w]
    diff = m[:, None, :] - m[:, :, None]
    return np.where(diff != 0, -100.0, 0.0).astype(np.float32)


def generate_shift_window_attn_mask_1d(input_w: int, window_size_w: int, shift_size_w: int) -> jnp.ndarray:
    """Additive 1D SW-MSA mask [K, W/K, W/K]; reference utils.py:199-216."""
    return jnp.asarray(_shift_window_mask_1d_np(input_w, window_size_w, shift_size_w))
