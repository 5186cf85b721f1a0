"""Fixed 2D sine/cosine position embedding (DETR-style), channels-last.

Reference semantics: unimatch/position.py:9-46 and the windowed application in
unimatch/utils.py:111-131 (`feature_add_position`). The embedding depends only
on (H, W, C) so it is computed with numpy at trace time and baked into the
compiled program as a constant — zero runtime cost on TPU.
"""

from __future__ import annotations

import functools
import math

import numpy as np
import jax.numpy as jnp

from unimatch_tpu.ops import windows as W


@functools.lru_cache(maxsize=None)
def _position_embedding_sine_np(
    h: int, w: int, num_pos_feats: int = 64, temperature: float = 10000.0
) -> np.ndarray:
    """[H, W, 2*num_pos_feats] with channels = concat(pos_y, pos_x)."""
    scale = 2 * math.pi
    eps = 1e-6
    y_embed = np.cumsum(np.ones((h, w), np.float32), axis=0)
    x_embed = np.cumsum(np.ones((h, w), np.float32), axis=1)
    y_embed = y_embed / (y_embed[-1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, -1:] + eps) * scale

    i = np.arange(num_pos_feats, dtype=np.float32)
    dim_t = temperature ** (2 * np.floor(i / 2) / num_pos_feats)

    pos_x = x_embed[:, :, None] / dim_t  # [H, W, F]
    pos_y = y_embed[:, :, None] / dim_t
    # interleave sin(even idx) / cos(odd idx)
    pos_x = np.stack([np.sin(pos_x[:, :, 0::2]), np.cos(pos_x[:, :, 1::2])], axis=3).reshape(h, w, -1)
    pos_y = np.stack([np.sin(pos_y[:, :, 0::2]), np.cos(pos_y[:, :, 1::2])], axis=3).reshape(h, w, -1)
    return np.concatenate([pos_y, pos_x], axis=-1).astype(np.float32)


def position_embedding_sine(h: int, w: int, channels: int) -> jnp.ndarray:
    """[H, W, channels] sine embedding; channels must be even."""
    assert channels % 2 == 0
    return jnp.asarray(_position_embedding_sine_np(h, w, num_pos_feats=channels // 2))


def feature_add_position(
    feature0: jnp.ndarray, feature1: jnp.ndarray, attn_splits: int, channels: int
):
    """Add sine position embedding, inside attention windows when attn_splits > 1.

    features: [B, H, W, C]. Reference utils.py:111-131.
    """
    b, h, w, c = feature0.shape
    if attn_splits > 1:
        # keep the feature dtype: the f32 embedding constant must not promote
        # the whole downstream transformer/matching stack to f32 on the bf16
        # path (profiled: this one promotion made every scale-1 FFN tensor
        # f32, ~2x the HBM traffic of the entire transformer)
        pos = position_embedding_sine(h // attn_splits, w // attn_splits, channels)
        pos = pos.astype(feature0.dtype)
        f0 = W.split_feature(feature0, attn_splits) + pos
        f1 = W.split_feature(feature1, attn_splits) + pos
        return W.merge_splits(f0, attn_splits), W.merge_splits(f1, attn_splits)
    pos = position_embedding_sine(h, w, channels).astype(feature0.dtype)
    return feature0 + pos, feature1 + pos
