"""Matching-layer ops vs the PyTorch reference (numerical oracle)."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from unimatch_tpu.ops import correlation as C

from reference_oracle import requires_reference, nchw, nhwc


@requires_reference
@pytest.mark.parametrize("bidir", [False, True])
def test_global_correlation_softmax(rng, bidir):
    from unimatch.matching import global_correlation_softmax

    b, h, w, c = 2, 6, 9, 16
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)

    flow, _ = C.global_correlation_softmax(jnp.asarray(f0), jnp.asarray(f1), pred_bidir_flow=bidir)

    ref_flow, _ = global_correlation_softmax(nchw(f0), nchw(f1), pred_bidir_flow=bidir)
    np.testing.assert_allclose(np.asarray(flow), nhwc(ref_flow), rtol=1e-4, atol=1e-5)


@requires_reference
@pytest.mark.parametrize("radius", [1, 4])
def test_local_correlation_softmax(rng, radius):
    from unimatch.matching import local_correlation_softmax

    b, h, w, c = 2, 7, 11, 16
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)

    flow, _ = C.local_correlation_softmax(jnp.asarray(f0), jnp.asarray(f1), radius)

    ref_flow, _ = local_correlation_softmax(nchw(f0), nchw(f1), radius)
    np.testing.assert_allclose(np.asarray(flow), nhwc(ref_flow), rtol=1e-4, atol=1e-5)


@requires_reference
def test_local_correlation_with_flow(rng):
    from unimatch.matching import local_correlation_with_flow

    b, h, w, c = 2, 8, 10, 16
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * 2.5).astype(np.float32)

    corr = C.local_correlation_with_flow(jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(flow), 4)

    ref = local_correlation_with_flow(nchw(f0), nchw(f1), flow=nchw(flow), local_radius=4)
    np.testing.assert_allclose(np.asarray(corr), nhwc(ref), rtol=1e-4, atol=1e-5)


@requires_reference
def test_global_correlation_softmax_stereo(rng):
    from unimatch.matching import global_correlation_softmax_stereo

    b, h, w, c = 2, 5, 12, 16
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)

    disp, _ = C.global_correlation_softmax_stereo(jnp.asarray(f0), jnp.asarray(f1))

    ref_disp, _ = global_correlation_softmax_stereo(nchw(f0), nchw(f1))
    np.testing.assert_allclose(np.asarray(disp), nhwc(ref_disp), rtol=1e-4, atol=1e-5)


@requires_reference
def test_local_correlation_softmax_stereo(rng):
    from unimatch.matching import local_correlation_softmax_stereo

    b, h, w, c = 2, 5, 12, 16
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)

    disp, _ = C.local_correlation_softmax_stereo(jnp.asarray(f0), jnp.asarray(f1), 4)

    ref_disp, _ = local_correlation_softmax_stereo(nchw(f0), nchw(f1), 4)
    # reference returns flow_x = -flow (positive disparity)
    np.testing.assert_allclose(np.asarray(disp), nhwc(ref_disp), rtol=1e-4, atol=1e-5)


def _random_pose(rng):
    """Small random rotation + translation, [4, 4]."""
    angle = rng.randn(3) * 0.05
    ax, ay, az = angle
    Rx = np.array([[1, 0, 0], [0, np.cos(ax), -np.sin(ax)], [0, np.sin(ax), np.cos(ax)]])
    Ry = np.array([[np.cos(ay), 0, np.sin(ay)], [0, 1, 0], [-np.sin(ay), 0, np.cos(ay)]])
    Rz = np.array([[np.cos(az), -np.sin(az), 0], [np.sin(az), np.cos(az), 0], [0, 0, 1]])
    pose = np.eye(4)
    pose[:3, :3] = Rz @ Ry @ Rx
    pose[:3, 3] = rng.randn(3) * 0.1
    return pose.astype(np.float32)


@requires_reference
@pytest.mark.parametrize("bidir", [False, True])
def test_correlation_softmax_depth(rng, bidir):
    from unimatch.matching import correlation_softmax_depth

    b, h, w, c, d = 1, 8, 10, 16, 8
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    K = np.array([[[12.0, 0, 4.5], [0, 12.0, 3.5], [0, 0, 1]]] * b, np.float32)
    pose = np.stack([_random_pose(rng) for _ in range(b)])
    inv_depth = np.linspace(1 / 0.5, 1 / 10.0, d, dtype=np.float32)
    cand = np.broadcast_to(inv_depth[None, :, None, None], (b, d, h, w)).copy()

    depth, _ = C.correlation_softmax_depth(
        jnp.asarray(f0),
        jnp.asarray(f1),
        jnp.asarray(K),
        jnp.asarray(pose),
        jnp.asarray(cand),
        pred_bidir_depth=bidir,
    )

    ref_depth, _ = correlation_softmax_depth(
        nchw(f0), nchw(f1), torch.from_numpy(K), torch.from_numpy(pose),
        depth_candidates=torch.from_numpy(cand), pred_bidir_depth=bidir,
    )
    np.testing.assert_allclose(np.asarray(depth), nhwc(ref_depth), rtol=1e-3, atol=1e-4)


def test_volume_lookup_matches_feature_gather(rng):
    """Precomputed-volume refinement lookup == direct feature gather."""
    import jax.numpy as jnp2

    b, h, w, c = 1, 10, 12, 32
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * 2.5).astype(np.float32)

    direct = C.local_correlation_with_flow(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(flow), 4
    )
    vol = C.build_full_correlation_volume(jnp.asarray(f0), jnp.asarray(f1)).astype(jnp.float32)
    via_volume = C.local_correlation_with_flow_from_volume(vol, jnp.asarray(flow), h, w, 4)
    # volume is stored bf16 -> ~1e-2 relative tolerance
    np.testing.assert_allclose(np.asarray(via_volume), np.asarray(direct), rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("flow_scale", [0.0, 2.5, 40.0])
@pytest.mark.parametrize("bshape", [(1, 10, 12), (2, 16, 20)])
def test_tiled_volume_lookup_matches_feature_gather(rng, bshape, flow_scale,
                                                    monkeypatch):
    """Tiled-volume refinement lookup == direct feature gather, including
    far out-of-bounds flows (zero-padding semantics) and batch > 1."""
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "0")  # float-volume semantics
    b, h, w = bshape
    c = 32
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * flow_scale).astype(np.float32)

    direct = C.local_correlation_with_flow(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(flow), 4
    )
    vol = C.build_tiled_correlation_volume(jnp.asarray(f0), jnp.asarray(f1), 4)
    via = C.local_correlation_with_flow_from_tiled_volume(vol, jnp.asarray(flow), 4)
    np.testing.assert_allclose(np.asarray(via), np.asarray(direct), rtol=1e-4, atol=1e-4)


@pytest.mark.parametrize("flow_scale", [0.0, 2.5, 40.0])
def test_tiled_volume_umajor_matches_feature_gather(rng, flow_scale, monkeypatch):
    """Unit-major volume layout (UNIMATCH_VOLUME_UMAJOR=1) == direct gather:
    the build writes [B, nUnits, Ppad, T*T] whose row-gather view is a no-op
    bitcast (the p-major form pays a 1.76 GB relayout copy per forward at
    the flagship shape — round-5 profiler trace)."""
    monkeypatch.setenv("UNIMATCH_VOLUME_UMAJOR", "1")
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "0")  # float-volume semantics
    b, h, w, c = 2, 16, 20, 32
    f0 = rng.randn(b, h, w, c).astype(np.float32)
    f1 = rng.randn(b, h, w, c).astype(np.float32)
    flow = (rng.randn(b, h, w, 2) * flow_scale).astype(np.float32)

    direct = C.local_correlation_with_flow(
        jnp.asarray(f0), jnp.asarray(f1), jnp.asarray(flow), 4
    )
    vol = C.build_tiled_correlation_volume(jnp.asarray(f0), jnp.asarray(f1), 4)
    assert vol.umajor
    assert vol.vt.shape[1] % 8 == 0  # nUnits, rounded for the build block
    via = C.local_correlation_with_flow_from_tiled_volume(vol, jnp.asarray(flow), 4)
    np.testing.assert_allclose(np.asarray(via), np.asarray(direct), rtol=1e-4, atol=1e-4)


def test_model_refine_volume_dispatch_matches_direct(rng, monkeypatch):
    """The refine loop's tiled-volume path == the direct gather path at the
    model level (UNIMATCH_REFINE_VOLUME=1 forces the volume dispatch on CPU)."""
    import jax
    from unimatch_tpu.config import ModelConfig, InferenceConfig
    from unimatch_tpu.models.unimatch import UniMatch

    cfg = ModelConfig(task="flow", num_scales=1, upsample_factor=8, reg_refine=True)
    infer = InferenceConfig(
        attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,),
        num_reg_refine=2,
    )
    model = UniMatch(config=cfg)
    img0 = jnp.asarray((rng.rand(1, 32, 48, 3) * 255).astype(np.float32))
    img1 = jnp.asarray((rng.rand(1, 32, 48, 3) * 255).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)

    monkeypatch.setenv("UNIMATCH_REFINE_VOLUME", "0")
    direct = model.apply(params, img0, img1, infer=infer)["flow_preds"][-1]
    monkeypatch.setenv("UNIMATCH_REFINE_VOLUME", "1")
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "0")
    via_vol = model.apply(params, img0, img1, infer=infer)["flow_preds"][-1]
    np.testing.assert_allclose(
        np.asarray(via_vol), np.asarray(direct), rtol=1e-3, atol=1e-3
    )
    # int8 volume (default-on since round-5h): dispatch smoke only — with
    # synthetic weights the refine net amplifies the bounded quantization
    # error chaotically (the same reason the golden flow-regrefine6 floor is
    # 44 px), so the numeric claim lives at the lookup level
    # (test_pallas_kernels.py::test_tiled_volume_int8_end_to_end_close)
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "1")
    via_q = np.asarray(model.apply(params, img0, img1, infer=infer)["flow_preds"][-1])
    assert via_q.shape == np.asarray(direct).shape
    assert np.isfinite(via_q).all()


def test_stereo_model_refine_volume_dispatch_matches_direct(rng, monkeypatch):
    """The STEREO regrefine loop shares the tiled-volume dispatch
    (unimatch.py refine dispatch covers task != depth): bf16-volume parity
    against the direct gather, plus an int8-arm dispatch/finiteness smoke —
    this is the path the gmstereo_scale2_regrefine3 bench variant runs
    default-on (int8 A/B: PERF_NOTES round-5i)."""
    import jax
    from unimatch_tpu.config import ModelConfig, InferenceConfig
    from unimatch_tpu.models.unimatch import UniMatch

    cfg = ModelConfig(task="stereo", num_scales=1, upsample_factor=8,
                      reg_refine=True)
    infer = InferenceConfig(
        attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,),
        attn_type="self_swin2d_cross_1d", num_reg_refine=2,
    )
    model = UniMatch(config=cfg)
    img0 = jnp.asarray((rng.rand(1, 32, 48, 3) * 255).astype(np.float32))
    img1 = jnp.asarray((rng.rand(1, 32, 48, 3) * 255).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)

    monkeypatch.setenv("UNIMATCH_REFINE_VOLUME", "0")
    direct = model.apply(params, img0, img1, infer=infer)["flow_preds"][-1]
    monkeypatch.setenv("UNIMATCH_REFINE_VOLUME", "1")
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "0")
    via_vol = model.apply(params, img0, img1, infer=infer)["flow_preds"][-1]
    np.testing.assert_allclose(
        np.asarray(via_vol), np.asarray(direct), rtol=1e-3, atol=1e-3
    )
    monkeypatch.setenv("UNIMATCH_VOLUME_INT8", "1")
    via_q = np.asarray(model.apply(params, img0, img1, infer=infer)["flow_preds"][-1])
    assert via_q.shape == np.asarray(direct).shape
    assert np.isfinite(via_q).all()