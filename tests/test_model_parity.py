"""Full-model forward parity: unimatch_tpu vs the PyTorch reference.

Builds the reference UniMatch with (seeded) random weights, converts the
state_dict with unimatch_tpu.convert, and compares final predictions for all
three tasks and the flagship configurations. This is the checkpoint-parity
guarantee: any public .pth converts the same way.
"""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from unimatch_tpu.config import ModelConfig, InferenceConfig
from unimatch_tpu.convert import convert_state_dict
from unimatch_tpu.models.unimatch import UniMatch

from reference_oracle import requires_reference, HAVE_REFERENCE


def _build_pair(rng, b=1, h=64, w=96, scale=255.0):
    img0 = (rng.rand(b, h, w, 3) * scale).astype(np.float32)
    img1 = (rng.rand(b, h, w, 3) * scale).astype(np.float32)
    return img0, img1


def _ref_model(cfg: ModelConfig):
    from unimatch.unimatch import UniMatch as TorchUniMatch

    torch.manual_seed(7)
    model = TorchUniMatch(
        num_scales=cfg.num_scales,
        feature_channels=cfg.feature_channels,
        upsample_factor=cfg.upsample_factor,
        num_head=1,
        ffn_dim_expansion=cfg.ffn_dim_expansion,
        num_transformer_layers=cfg.num_transformer_layers,
        reg_refine=cfg.reg_refine,
        task=cfg.task,
    )
    model.eval()
    return model


def _convert(model) -> dict:
    return {"params": convert_state_dict(model.state_dict())}


def _jax_model(cfg):
    return UniMatch(config=cfg)


def _run_pair(cfg, infer, rng, *, bidir_flow=False, h=64, w=96, atol=2e-3):
    torch_model = _ref_model(cfg)
    params = _convert(torch_model)

    img0, img1 = _build_pair(rng, h=h, w=w, scale=255.0 if cfg.task == "flow" else 1.0)

    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(img1).permute(0, 3, 1, 2),
            attn_type=infer.attn_type,
            attn_splits_list=list(infer.attn_splits_list),
            corr_radius_list=list(infer.corr_radius_list),
            prop_radius_list=list(infer.prop_radius_list),
            num_reg_refine=infer.num_reg_refine,
            pred_bidir_flow=bidir_flow,
            task=cfg.task,
        )["flow_preds"][-1]

    model = _jax_model(cfg)
    out = model.apply(
        params, jnp.asarray(img0), jnp.asarray(img1), infer=infer, pred_bidir_flow=bidir_flow
    )["flow_preds"][-1]

    got = np.asarray(out)
    if cfg.task == "flow":
        want = ref.permute(0, 2, 3, 1).numpy()
    else:
        want = ref.numpy()  # [B, H, W]
    assert got.shape == want.shape, (got.shape, want.shape)
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=atol)


@requires_reference
def test_flow_scale1(rng):
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    _run_pair(cfg, infer, rng)


@requires_reference
def test_flow_scale1_bidir(rng):
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    _run_pair(cfg, infer, rng, bidir_flow=True)


@requires_reference
def test_flow_scale2(rng):
    # hierarchical configs: softmax-argmax over *random-weight* features
    # chaotically amplifies fp reordering noise (backbone parity is ~3e-5);
    # tolerance = the 0.05 EPE north-star budget.
    cfg = ModelConfig(task="flow", num_scales=2, upsample_factor=4)
    infer = InferenceConfig(
        attn_splits_list=(2, 8), corr_radius_list=(-1, 4), prop_radius_list=(-1, 1)
    )
    _run_pair(cfg, infer, rng, atol=0.05)


@requires_reference
def test_flow_scale2_regrefine(rng):
    cfg = ModelConfig(task="flow", num_scales=2, upsample_factor=4, reg_refine=True)
    infer = InferenceConfig(
        attn_splits_list=(2, 8),
        corr_radius_list=(-1, 4),
        prop_radius_list=(-1, 1),
        num_reg_refine=2,
    )
    _run_pair(cfg, infer, rng, atol=0.05)


@requires_reference
def test_stereo_scale1(rng):
    cfg = ModelConfig(task="stereo", num_scales=1)
    infer = InferenceConfig(
        attn_type="self_swin2d_cross_1d",
        attn_splits_list=(2,),
        corr_radius_list=(-1,),
        prop_radius_list=(-1,),
    )
    _run_pair(cfg, infer, rng)


@requires_reference
def test_stereo_scale2_regrefine(rng):
    cfg = ModelConfig(task="stereo", num_scales=2, upsample_factor=4, reg_refine=True)
    infer = InferenceConfig(
        attn_type="self_swin2d_cross_swin1d",
        attn_splits_list=(2, 8),
        corr_radius_list=(-1, 4),
        prop_radius_list=(-1, 1),
        num_reg_refine=2,
    )
    _run_pair(cfg, infer, rng, atol=0.05)


def _depth_inputs(rng, b=1, h=64, w=96):
    K = np.array([[[50.0, 0, w / 2], [0, 50.0, h / 2], [0, 0, 1]]] * b, np.float32)
    angle = 0.02
    pose = np.eye(4, dtype=np.float32)
    pose[:3, :3] = np.array(
        [[np.cos(angle), -np.sin(angle), 0], [np.sin(angle), np.cos(angle), 0], [0, 0, 1]],
        np.float32,
    )
    pose[:3, 3] = [0.05, -0.02, 0.03]
    return K, np.broadcast_to(pose[None], (b, 4, 4)).copy()


@requires_reference
@pytest.mark.parametrize("reg_refine", [False, True])
def test_depth_scale1(rng, reg_refine):
    cfg = ModelConfig(task="depth", num_scales=1, reg_refine=reg_refine)
    infer = InferenceConfig(
        attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,), num_reg_refine=1
    )
    torch_model = _ref_model(cfg)
    params = _convert(torch_model)

    img0, img1 = _build_pair(rng, scale=1.0)
    K, pose = _depth_inputs(rng)

    with torch.no_grad():
        ref = torch_model(
            torch.from_numpy(img0).permute(0, 3, 1, 2),
            torch.from_numpy(img1).permute(0, 3, 1, 2),
            attn_type=infer.attn_type,
            attn_splits_list=list(infer.attn_splits_list),
            prop_radius_list=list(infer.prop_radius_list),
            num_reg_refine=infer.num_reg_refine,
            task="depth",
            intrinsics=torch.from_numpy(K),
            pose=torch.from_numpy(pose),
            min_depth=1.0 / 10.0,
            max_depth=1.0 / 0.5,
            num_depth_candidates=32,
        )["flow_preds"][-1]

    infer = InferenceConfig(
        attn_splits_list=(2,),
        corr_radius_list=(-1,),
        prop_radius_list=(-1,),
        num_reg_refine=1,
        min_depth=1.0 / 10.0,
        max_depth=1.0 / 0.5,
        num_depth_candidates=32,
    )
    model = _jax_model(cfg)
    out = model.apply(
        params,
        jnp.asarray(img0),
        jnp.asarray(img1),
        infer=infer,
        intrinsics=jnp.asarray(K),
        pose=jnp.asarray(pose),
    )["flow_preds"][-1]

    np.testing.assert_allclose(np.asarray(out), ref.numpy(), rtol=1e-3, atol=5e-3)


@requires_reference
def test_param_count_matches_reference():
    """Converted tree has exactly the same parameters (count and shapes)."""
    cfg = ModelConfig(task="flow", num_scales=2, upsample_factor=4, reg_refine=True)
    torch_model = _ref_model(cfg)
    params = convert_state_dict(torch_model.state_dict())
    n_torch = sum(p.numel() for p in torch_model.parameters())
    n_jax = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(params))
    assert n_torch == n_jax

    # and flax init produces the identical tree structure
    model = UniMatch(config=cfg)
    infer = InferenceConfig(
        attn_splits_list=(2, 8), corr_radius_list=(-1, 4), prop_radius_list=(-1, 1),
        num_reg_refine=1,
    )
    img = jnp.zeros((1, 32, 32, 3), jnp.float32)
    init_params = model.init(jax.random.PRNGKey(0), img, img, infer=infer)["params"]
    got = {"/".join(map(str, k)) for k, _ in jax.tree_util.tree_leaves_with_path(
        jax.tree_util.tree_map(lambda x: 0, init_params))}
    want_paths = set()
    def walk(node, prefix):
        for k, v in node.items():
            if isinstance(v, dict):
                walk(v, prefix + [k])
            else:
                want_paths.add("/".join(prefix + [k]))
    walk(params, [])
    flat_init = jax.tree_util.tree_leaves_with_path(init_params)
    init_paths = {"/".join(p.key for p in path) for path, _ in flat_init}
    assert init_paths == want_paths, (
        sorted(init_paths - want_paths), sorted(want_paths - init_paths)
    )


def test_refine_scan_matches_python_loop(rng, monkeypatch):
    """UNIMATCH_REFINE_SCAN path (incl. the mask-head-on-final-state hoist)
    == the unrolled Python loop, at inference (one upsampled pred) and in
    training mode (per-iteration deep-supervision preds with masks)."""
    cfg = ModelConfig(task="flow", num_scales=2, upsample_factor=4, reg_refine=True)
    infer = InferenceConfig(
        attn_splits_list=(2, 2), corr_radius_list=(-1, 4), prop_radius_list=(-1, 1),
        num_reg_refine=2,
    )
    img0, img1 = _build_pair(rng, h=64, w=96, scale=255.0)
    model = _jax_model(cfg)
    params = model.init(
        jax.random.PRNGKey(0), jnp.asarray(img0), jnp.asarray(img1), infer=infer
    )

    for training in (False, True):
        monkeypatch.setenv("UNIMATCH_REFINE_SCAN", "0")
        want = model.apply(
            params, jnp.asarray(img0), jnp.asarray(img1), infer=infer,
            training=training,
        )["flow_preds"]
        monkeypatch.setenv("UNIMATCH_REFINE_SCAN", "1")
        got = model.apply(
            params, jnp.asarray(img0), jnp.asarray(img1), infer=infer,
            training=training,
        )["flow_preds"]
        assert len(got) == len(want)
        for i, (g, wnt) in enumerate(zip(got, want)):
            # scan and unrolled compile to different fusion/reduction orders;
            # f32 drift through 2 refine iterations + convex upsample is a
            # few 1e-3 on O(20) values
            np.testing.assert_allclose(
                np.asarray(g), np.asarray(wnt), rtol=1e-3, atol=2e-2,
                err_msg=f"training={training} pred {i}",
            )
