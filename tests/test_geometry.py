"""L0 geometry ops vs torch reference semantics (torch CPU as oracle)."""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from unimatch_tpu.ops import geometry as G


def torch_grid_sample_pixel(img_nchw, coords_xy, padding_mode="zeros"):
    """torch grid_sample at pixel coords (align_corners=True), NCHW in/out."""
    b, c, h, w = img_nchw.shape
    x = 2 * coords_xy[..., 0] / (w - 1) - 1
    y = 2 * coords_xy[..., 1] / (h - 1) - 1
    grid = torch.stack([x, y], dim=-1)
    return F.grid_sample(img_nchw, grid, mode="bilinear", padding_mode=padding_mode, align_corners=True)


@pytest.mark.parametrize("padding_mode", ["zeros", "border"])
def test_grid_sample_matches_torch(rng, padding_mode):
    b, h, w, c = 2, 13, 17, 5
    img = rng.randn(b, h, w, c).astype(np.float32)
    # coords spanning in-bounds, fractional, and far out-of-bounds
    coords = (rng.rand(b, 9, 11, 2).astype(np.float32) * 1.6 - 0.3) * np.array([w, h], np.float32)

    out_jax = np.asarray(G.grid_sample(jnp.asarray(img), jnp.asarray(coords), padding_mode=padding_mode))

    img_t = torch.from_numpy(img).permute(0, 3, 1, 2)
    out_t = torch_grid_sample_pixel(img_t, torch.from_numpy(coords), padding_mode)
    out_t = out_t.permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(out_jax, out_t, rtol=1e-5, atol=1e-5)


def test_flow_warp_matches_torch(rng):
    b, h, w, c = 2, 16, 24, 8
    feat = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * 3).astype(np.float32)

    out = np.asarray(G.flow_warp(jnp.asarray(feat), jnp.asarray(flow)))

    # torch oracle: grid_sample at coords_grid + flow
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([xs, ys], axis=-1)[None].astype(np.float32) + flow
    feat_t = torch.from_numpy(feat).permute(0, 3, 1, 2)
    out_t = torch_grid_sample_pixel(feat_t, torch.from_numpy(grid)).permute(0, 2, 3, 1).numpy()

    np.testing.assert_allclose(out, out_t, rtol=1e-5, atol=1e-5)


def test_resize_bilinear_align_corners(rng):
    b, h, w, c = 2, 12, 10, 3
    x = rng.randn(b, h, w, c).astype(np.float32)
    out = np.asarray(G.resize_bilinear_align_corners(jnp.asarray(x), 2 * h, 2 * w))
    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    out_t = F.interpolate(x_t, scale_factor=2, mode="bilinear", align_corners=True)
    np.testing.assert_allclose(out, out_t.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)


def test_resize_downscale(rng):
    b, h, w, c = 1, 16, 20, 2
    x = rng.randn(b, h, w, c).astype(np.float32)
    out = np.asarray(G.resize_bilinear_align_corners(jnp.asarray(x), h // 2, w // 2))
    x_t = torch.from_numpy(x).permute(0, 3, 1, 2)
    out_t = F.interpolate(x_t, size=(h // 2, w // 2), mode="bilinear", align_corners=True)
    np.testing.assert_allclose(out, out_t.permute(0, 2, 3, 1).numpy(), rtol=1e-5, atol=1e-5)


def test_coords_grid():
    g = np.asarray(G.coords_grid(3, 4))
    assert g.shape == (3, 4, 2)
    assert g[1, 2, 0] == 2  # x
    assert g[1, 2, 1] == 1  # y


def test_back_project_reproject_roundtrip(rng):
    b, h, w = 2, 8, 10
    depth = (rng.rand(b, h, w) * 5 + 1).astype(np.float32)
    K = np.array([[[20.0, 0, 4.5], [0, 21.0, 3.5], [0, 0, 1]]] * b, np.float32)
    pts = G.back_project(jnp.asarray(depth), jnp.asarray(K))
    pix = G.reproject(pts, jnp.asarray(K))
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    grid = np.stack([xs, ys], axis=-1).astype(np.float32)
    np.testing.assert_allclose(np.asarray(pix), np.broadcast_to(grid, (b, h, w, 2)), atol=1e-3)


def test_compute_flow_with_depth_pose_identity(rng):
    b, h, w = 1, 8, 10
    depth = (rng.rand(b, h, w) * 5 + 1).astype(np.float32)
    K = np.array([[[20.0, 0, 4.5], [0, 21.0, 3.5], [0, 0, 1]]], np.float32)
    pose = np.eye(4, dtype=np.float32)[None]
    flow = G.compute_flow_with_depth_pose(jnp.asarray(depth), jnp.asarray(K), extrinsics_rel=jnp.asarray(pose))
    np.testing.assert_allclose(np.asarray(flow), 0.0, atol=1e-3)


def test_forward_backward_consistency_zero_flow(rng):
    b, h, w = 1, 8, 8
    z = np.zeros((b, h, w, 2), np.float32)
    fwd_occ, bwd_occ = G.forward_backward_consistency_check(jnp.asarray(z), jnp.asarray(z))
    assert fwd_occ.sum() == 0 and bwd_occ.sum() == 0
