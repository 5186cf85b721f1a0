"""DepthSplat variant: shape/finiteness tests (no public oracle available —
the reference's DINOv2 branch requires a torch.hub download)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from unimatch_tpu.models.unimatch_depthsplat import DepthSplatConfig, UniMatchDepthSplat


def _inputs(rng, b=1, h=64, w=96):
    img0 = rng.randn(b, h, w, 3).astype(np.float32)
    img1 = rng.randn(b, h, w, 3).astype(np.float32)
    K = np.array([[[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]]] * b, np.float32)
    pose = np.eye(4, dtype=np.float32)
    pose[:3, 3] = [0.05, 0.0, 0.02]
    return img0, img1, K, np.broadcast_to(pose[None], (b, 4, 4)).copy()


@pytest.mark.parametrize("num_scales", [1, 2])
def test_depthsplat_forward_shapes(rng, num_scales):
    cfg = DepthSplatConfig(num_scales=num_scales, num_depth_candidates=32,
                           upsample_factor=8 // num_scales if num_scales == 2 else 8)
    # keep the canonical pairing: num_scales=2 uses upsample_factor 4
    cfg = DepthSplatConfig(num_scales=num_scales,
                           upsample_factor=4 if num_scales == 2 else 8,
                           num_depth_candidates=32)
    model = UniMatchDepthSplat(config=cfg)
    img0, img1, K, pose = _inputs(rng)

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(K), jnp.asarray(pose), attn_splits_list=(2,) ,
    )
    out = model.apply(
        variables, jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(K), jnp.asarray(pose),
        attn_splits_list=(2,),
    )["flow_preds"]
    final = np.asarray(out[-1])
    assert final.shape == (2, img0.shape[1], img0.shape[2])  # bidirectional
    assert np.isfinite(final).all()
    assert (final > 0).all()  # metric depth


def test_depthsplat_training_supervision(rng):
    cfg = DepthSplatConfig(num_scales=1, num_depth_candidates=16)
    model = UniMatchDepthSplat(config=cfg)
    img0, img1, K, pose = _inputs(rng)
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img0), jnp.asarray(img1),
        jnp.asarray(K), jnp.asarray(pose), attn_splits_list=(2,), training=True,
    )
    out = model.apply(
        variables, jnp.asarray(img0), jnp.asarray(img1), jnp.asarray(K), jnp.asarray(pose),
        attn_splits_list=(2,), training=True,
    )["flow_preds"]
    assert len(out) == 2  # intermediate + final
