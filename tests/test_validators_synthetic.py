"""End-to-end validators on tiny synthetic dataset trees (CPU)."""

import os

import numpy as np
import pytest
from PIL import Image

import jax

from unimatch_tpu.config import InferenceConfig, ModelConfig
from unimatch_tpu.models.unimatch import UniMatch
from unimatch_tpu.utils import frame_utils

from test_data_pipeline import _make_sintel, _make_kitti


def _flow_model():
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model = UniMatch(config=cfg)
    import jax.numpy as jnp

    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img, infer=infer)
    return model, params, infer


def test_validate_sintel_synthetic(tmp_path):
    from unimatch_tpu.evaluate.flow import validate_sintel

    root = str(tmp_path / "Sintel")
    _make_sintel(root, scenes=1, frames=3)
    model, params, infer = _flow_model()
    out = validate_sintel(model, params, infer, root=root, padding_factor=16,
                          with_speed_metric=True)
    assert "sintel_clean_epe" in out and np.isfinite(out["sintel_clean_epe"])


def test_validate_kitti_synthetic(tmp_path):
    from unimatch_tpu.evaluate.flow import validate_kitti

    root = str(tmp_path / "KITTI")
    _make_kitti(root, n=2)
    model, params, infer = _flow_model()
    out = validate_kitti(model, params, infer, root=root, padding_factor=16,
                         with_speed_metric=True)
    assert np.isfinite(out["kitti_epe"]) and np.isfinite(out["kitti_f1"])
    assert "kitti_s0_10" in out and "kitti_s10_40" in out and "kitti_s40+" in out
    # per-image averaging variant (reference average_over_pixels=False)
    out2 = validate_kitti(model, params, infer, root=root, padding_factor=16,
                          average_over_pixels=False)
    assert np.isfinite(out2["kitti_epe"])


def test_sintel_submission_synthetic(tmp_path):
    from unimatch_tpu.evaluate.flow import create_sintel_submission

    root = str(tmp_path / "Sintel")
    # submission reads the *test* split
    rng = np.random.RandomState(0)
    for dstype in ("clean", "final"):
        d = os.path.join(root, "test", dstype, "scene_x")
        os.makedirs(d, exist_ok=True)
        for f in range(3):
            Image.fromarray((rng.rand(64, 96, 3) * 255).astype(np.uint8)).save(
                os.path.join(d, f"frame_{f:04d}.png")
            )
    model, params, infer = _flow_model()
    out_dir = str(tmp_path / "submission")
    create_sintel_submission(model, params, infer, root=root, output_path=out_dir,
                             padding_factor=16)
    flo = os.path.join(out_dir, "clean", "scene_x", "frame0001.flo")
    assert os.path.isfile(flo)
    flow = frame_utils.read_flo(flo)
    assert flow.shape == (64, 96, 2)


def _make_kitti15_stereo(root, n=2, h=64, w=96):
    rng = np.random.RandomState(2)
    for sub in ("image_2", "image_3", "disp_occ_0"):
        os.makedirs(os.path.join(root, "training", sub), exist_ok=True)
    for i in range(n):
        for sub in ("image_2", "image_3"):
            Image.fromarray((rng.rand(h, w, 3) * 255).astype(np.uint8)).save(
                os.path.join(root, "training", sub, f"{i:06d}_10.png")
            )
        disp = (rng.rand(h, w) * 40).astype(np.float32)
        from unimatch_tpu.utils.frame_utils import write_kitti_disp_png

        write_kitti_disp_png(os.path.join(root, "training", "disp_occ_0", f"{i:06d}_10.png"), disp)


def test_validate_kitti15_stereo_synthetic(tmp_path):
    from unimatch_tpu.evaluate.stereo import validate_kitti15
    import jax.numpy as jnp

    root = str(tmp_path / "kitti15")
    _make_kitti15_stereo(root)

    cfg = ModelConfig(task="stereo", num_scales=1)
    infer = InferenceConfig(
        attn_type="self_swin2d_cross_1d",
        attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,),
    )
    model = UniMatch(config=cfg)
    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img, infer=infer)

    out = validate_kitti15(model, params, infer, root=root, padding_factor=16)
    assert np.isfinite(out["kitti15_epe"]) and np.isfinite(out["kitti15_d1"])
