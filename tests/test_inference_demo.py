"""End-to-end demo smoke tests on the bundled demo assets (CPU).

These mirror BASELINE.json configs[0] (GMFlow scale1 on demo/flow-davis) and
configs[2] (GMDepth on demo/depth-scannet): full inference pipeline, file
outputs, finite values. The assets are the repo's own synthetic scenes
(scripts/make_demo_assets.py) so the suite is self-contained; set
UNIMATCH_DEMO_ROOT to run against other footage (e.g. the reference demos).
"""

import os

import numpy as np
import pytest

import jax

from unimatch_tpu.config import ModelConfig, InferenceConfig
from unimatch_tpu.models.unimatch import UniMatch
from unimatch_tpu.inference import inference_flow, inference_depth

_DEMO_ROOT = os.environ.get(
    "UNIMATCH_DEMO_ROOT",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "demo"),
)
DEMO_FLOW = os.path.join(_DEMO_ROOT, "flow-davis")
DEMO_DEPTH = os.path.join(_DEMO_ROOT, "depth-scannet")


def _init(cfg, infer, h=64, w=96, **kw):
    import jax.numpy as jnp

    model = UniMatch(config=cfg)
    img = jnp.zeros((1, h, w, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img, infer=infer, **kw)
    return model, params


@pytest.mark.skipif(not os.path.isdir(DEMO_FLOW), reason="demo assets unavailable")
def test_inference_flow_davis(tmp_path):
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model, params = _init(cfg, infer)

    written = inference_flow(
        model,
        params,
        infer,
        inference_dir=DEMO_FLOW,
        output_path=str(tmp_path),
        padding_factor=16,
        save_flo_flow=True,
    )
    flo_files = [f for f in written if f.endswith(".flo")]
    png_files = [f for f in written if f.endswith(".png")]
    assert len(flo_files) == 2 and len(png_files) == 2  # 3 frames -> 2 pairs
    from unimatch_tpu.utils.frame_utils import read_flo

    flow = read_flo(flo_files[0])
    assert np.isfinite(flow).all()
    # original DAVIS resolution restored
    from PIL import Image

    w, h = Image.open(os.path.join(DEMO_FLOW, "00000.jpg")).size
    assert flow.shape == (h, w, 2)


@pytest.mark.skipif(not os.path.isdir(DEMO_DEPTH), reason="demo assets unavailable")
def test_inference_depth_scannet(tmp_path):
    cfg = ModelConfig(task="depth", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model, params = _init(
        cfg,
        infer,
        intrinsics=np.eye(3, dtype=np.float32)[None] * 50.0,
        pose=np.eye(4, dtype=np.float32)[None],
    )

    written = inference_depth(
        model,
        params,
        infer,
        inference_dir=DEMO_DEPTH,
        output_path=str(tmp_path),
        padding_factor=16,
    )
    npys = [f for f in written if f.endswith(".npy")]
    assert len(npys) == 3  # 4 frames -> 3 pairs
    depth = np.load(npys[0])
    assert np.isfinite(depth).all()
    assert (depth > 0).all()


DEMO_STEREO = os.path.join(_DEMO_ROOT, "stereo-middlebury")


@pytest.mark.skipif(not os.path.isdir(DEMO_STEREO), reason="demo assets unavailable")
def test_inference_stereo_demo(tmp_path):
    from unimatch_tpu.inference import inference_stereo

    cfg = ModelConfig(task="stereo", num_scales=1)
    infer = InferenceConfig(
        attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,),
        attn_type="self_swin2d_cross_1d",
    )
    model, params = _init(cfg, infer)

    written = inference_stereo(
        model,
        params,
        infer,
        inference_dir=DEMO_STEREO,
        output_path=str(tmp_path),
        padding_factor=16,
        save_pfm_disp=True,
    )
    assert any(f.endswith(".png") for f in written)
    pfms = [f for f in written if f.endswith(".pfm")]
    assert pfms
    from unimatch_tpu.utils.frame_utils import read_pfm

    disp = read_pfm(pfms[0])[0]
    assert np.isfinite(disp).all()


@pytest.mark.skipif(not os.path.isdir(DEMO_FLOW), reason="demo assets unavailable")
def test_inference_flow_bidir_occlusion(tmp_path):
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model, params = _init(cfg, infer)

    written = inference_flow(
        model,
        params,
        infer,
        inference_dir=DEMO_FLOW,
        output_path=str(tmp_path),
        padding_factor=16,
        pred_bidir_flow=True,
        fwd_bwd_consistency_check=True,
    )
    assert any(f.endswith("_occ_fwd.png") for f in written)
    assert any(f.endswith("_occ_bwd.png") for f in written)
    assert any(f.endswith("_flow_bwd.png") for f in written)
