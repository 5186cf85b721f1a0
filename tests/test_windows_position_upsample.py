"""Window partition, position embedding, unfold, and convex upsampling vs torch oracles."""

import math

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unimatch_tpu.ops import windows as W
from unimatch_tpu.ops import position as P
from unimatch_tpu.ops import upsample as U


def test_split_merge_roundtrip(rng):
    x = rng.randn(2, 8, 12, 5).astype(np.float32)
    s = W.split_feature(jnp.asarray(x), 2)
    assert s.shape == (8, 4, 6, 5)
    m = W.merge_splits(s, 2)
    np.testing.assert_array_equal(np.asarray(m), x)


def test_split_feature_matches_torch_layout(rng):
    """Window-major ordering must match the reference's view/permute pattern."""
    x = rng.randn(1, 4, 4, 1).astype(np.float32)
    s = np.asarray(W.split_feature(jnp.asarray(x), 2))
    # torch oracle (utils.py:38-47 semantics)
    t = torch.from_numpy(x)
    b, h, w, c = t.shape
    k = 2
    ref = (
        t.view(b, k, h // k, k, w // k, c).permute(0, 1, 3, 2, 4, 5).reshape(b * k * k, h // k, w // k, c)
    )
    np.testing.assert_array_equal(s, ref.numpy())


def test_split_merge_1d(rng):
    x = rng.randn(6, 12, 3).astype(np.float32)  # [B*H, W, C] with B=2, H=3
    s = W.split_feature_1d(jnp.asarray(x), 4)
    assert s.shape == (24, 3, 3)
    m = W.merge_splits_1d(s, h=3, num_splits=4)
    np.testing.assert_array_equal(np.asarray(m).reshape(6, 12, 3), x)


def _torch_shift_window_mask(h, w, win_h, win_w, shift_h, shift_w):
    img_mask = torch.zeros((1, h, w, 1))
    h_slices = (slice(0, -win_h), slice(-win_h, -shift_h), slice(-shift_h, None))
    w_slices = (slice(0, -win_w), slice(-win_w, -shift_w), slice(-shift_w, None))
    cnt = 0
    for hs in h_slices:
        for ws in w_slices:
            img_mask[:, hs, ws, :] = cnt
            cnt += 1
    k = w // win_w
    b, hh, ww, c = img_mask.shape
    mw = (
        img_mask.view(b, k, hh // k, k, ww // k, c)
        .permute(0, 1, 3, 2, 4, 5)
        .reshape(b * k * k, hh // k, ww // k, c)
    )
    mw = mw.view(-1, win_h * win_w)
    attn_mask = mw.unsqueeze(1) - mw.unsqueeze(2)
    attn_mask = attn_mask.masked_fill(attn_mask != 0, float(-100.0)).masked_fill(attn_mask == 0, float(0.0))
    return attn_mask.numpy()


def test_shift_window_mask_matches_torch():
    h, w = 8, 12
    k = 2
    win_h, win_w = h // k, w // k
    got = np.asarray(W.generate_shift_window_attn_mask(h, w, win_h, win_w, win_h // 2, win_w // 2))
    ref = _torch_shift_window_mask(h, w, win_h, win_w, win_h // 2, win_w // 2)
    np.testing.assert_array_equal(got, ref)


def _torch_position_embedding(h, w, num_pos_feats=64, temperature=10000):
    mask = torch.ones((1, h, w))
    y_embed = mask.cumsum(1, dtype=torch.float32)
    x_embed = mask.cumsum(2, dtype=torch.float32)
    eps = 1e-6
    scale = 2 * math.pi
    y_embed = y_embed / (y_embed[:, -1:, :] + eps) * scale
    x_embed = x_embed / (x_embed[:, :, -1:] + eps) * scale
    dim_t = torch.arange(num_pos_feats, dtype=torch.float32)
    dim_t = temperature ** (2 * torch.div(dim_t, 2, rounding_mode="floor") / num_pos_feats)
    pos_x = x_embed[:, :, :, None] / dim_t
    pos_y = y_embed[:, :, :, None] / dim_t
    pos_x = torch.stack((pos_x[:, :, :, 0::2].sin(), pos_x[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos_y = torch.stack((pos_y[:, :, :, 0::2].sin(), pos_y[:, :, :, 1::2].cos()), dim=4).flatten(3)
    pos = torch.cat((pos_y, pos_x), dim=3)  # [1, H, W, C]
    return pos[0].numpy()


def test_position_embedding_matches_torch():
    got = np.asarray(P.position_embedding_sine(7, 9, 128))
    ref = _torch_position_embedding(7, 9, 64)
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_extract_patches_matches_unfold(rng):
    b, h, w, c = 2, 6, 7, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    got = np.asarray(U.extract_patches(jnp.asarray(x), 3, 1))  # [B, H, W, 9, C]
    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    ref = F.unfold(x_t, [3, 3], padding=1).view(b, c, 9, h, w).permute(0, 3, 4, 2, 1).numpy()
    np.testing.assert_array_equal(got, ref)


@pytest.mark.parametrize("is_depth", [False, True])
def test_convex_upsample_matches_torch(rng, is_depth):
    b, h, w, cf, k = 2, 5, 6, 2, 4
    flow = rng.randn(b, h, w, cf).astype(np.float32)
    mask = rng.randn(b, h, w, 9 * k * k).astype(np.float32)

    got = np.asarray(U.upsample_with_mask(jnp.asarray(flow), jnp.asarray(mask), k, is_depth=is_depth))

    # torch oracle (utils.py:134-152 semantics)
    flow_t = torch.from_numpy(flow).permute(0, 3, 1, 2)
    mask_t = torch.from_numpy(mask).permute(0, 3, 1, 2)
    m = mask_t.view(b, 1, 9, k, k, h, w)
    m = torch.softmax(m, dim=2)
    multiplier = 1 if is_depth else k
    up_flow = F.unfold(multiplier * flow_t, [3, 3], padding=1)
    up_flow = up_flow.view(b, cf, 9, 1, 1, h, w)
    up_flow = torch.sum(m * up_flow, dim=2)
    up_flow = up_flow.permute(0, 1, 4, 2, 5, 3).reshape(b, cf, k * h, k * w)
    ref = up_flow.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
