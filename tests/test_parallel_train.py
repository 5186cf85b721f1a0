"""Data-parallel training step on the virtual 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.config import ModelConfig, InferenceConfig
from unimatch_tpu.models.unimatch import UniMatch
from unimatch_tpu.parallel import make_mesh, create_train_state, make_train_step
from unimatch_tpu.parallel.mesh import shard_batch


def _flow_batch(rng, b, h, w):
    return {
        "img0": (rng.rand(b, h, w, 3) * 255).astype(np.float32),
        "img1": (rng.rand(b, h, w, 3) * 255).astype(np.float32),
        "flow_gt": (rng.randn(b, h, w, 2) * 2).astype(np.float32),
        "valid": np.ones((b, h, w), np.float32),
    }


def test_train_step_8dev_matches_single(rng):
    """DP over 8 devices must produce the same update as single-device."""
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model = UniMatch(config=cfg)
    batch = _flow_batch(rng, 8, 32, 48)

    state0 = create_train_state(model, jax.random.PRNGKey(0), batch, infer)

    # single device
    step_1 = make_train_step(model, infer)
    state_1, m1 = step_1(state0, jax.tree.map(jnp.asarray, batch))

    # 8-device mesh
    state0b = create_train_state(model, jax.random.PRNGKey(0), batch, infer)
    mesh = make_mesh(jax.devices())
    with mesh:
        sbatch = shard_batch(mesh, batch)
        step_8 = make_train_step(model, infer, mesh=mesh)
        state_8, m8 = step_8(state0b, sbatch)

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    # parameter updates identical (DP is exact data parallelism)
    l1 = jax.tree.leaves(state_1.params)
    l8 = jax.tree.leaves(jax.device_get(state_8.params))
    for a, b in zip(l1, l8):
        # tiny fp differences from all-reduce reduction order
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=5e-5)


def test_train_step_decreases_loss(rng):
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model = UniMatch(config=cfg)
    batch = _flow_batch(rng, 2, 32, 48)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, infer)
    step = make_train_step(model, infer)
    batch_j = jax.tree.map(jnp.asarray, batch)
    losses = []
    for _ in range(3):
        state, metrics = step(state, batch_j)
        losses.append(float(metrics["loss"]))
    assert losses[-1] < losses[0], losses


def _depth_batch(rng, b, h, w):
    K = np.array([[40.0, 0, w / 2], [0, 40.0, h / 2], [0, 0, 1]], np.float32)
    return {
        "img0": (rng.rand(b, h, w, 3) * 255).astype(np.float32),
        "img1": (rng.rand(b, h, w, 3) * 255).astype(np.float32),
        "depth_gt": (1.0 + rng.rand(b, h, w) * 5).astype(np.float32),
        "valid": np.ones((b, h, w), np.float32),
        "intrinsics": np.tile(K[None], (b, 1, 1)),
        "pose": np.tile(np.eye(4, dtype=np.float32)[None], (b, 1, 1)),
    }


def test_depth_train_step(rng):
    """Depth-task training: init pulls intrinsics/pose from the batch."""
    cfg = ModelConfig(task="depth", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,),
                            prop_radius_list=(-1,), num_depth_candidates=16)
    model = UniMatch(config=cfg)
    batch = _depth_batch(rng, 2, 32, 48)
    state = create_train_state(model, jax.random.PRNGKey(0), batch, infer)
    step = make_train_step(model, infer)
    state, metrics = step(state, jax.tree.map(jnp.asarray, batch))
    assert np.isfinite(float(metrics["loss"]))
    assert "depth_l1" in metrics and "depth_grad" in metrics


def test_depthsplat_adapter_train_step(rng):
    """DepthSplatAdapter drives the generic depth train step end to end."""
    from unimatch_tpu.evaluate.depth import DepthSplatAdapter
    from unimatch_tpu.models.unimatch_depthsplat import DepthSplatConfig, UniMatchDepthSplat

    ds_model = UniMatchDepthSplat(config=DepthSplatConfig(num_scales=1, num_depth_candidates=16))
    adapter = DepthSplatAdapter(ds_model, attn_splits_list=(2,))
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    batch = _depth_batch(rng, 1, 64, 96)
    state = create_train_state(adapter, jax.random.PRNGKey(0), batch, infer)
    step = make_train_step(adapter, infer)
    state, metrics = step(state, jax.tree.map(jnp.asarray, batch))
    assert np.isfinite(float(metrics["loss"]))


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(np.asarray(out)).all()


def test_graft_entry_multichip():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_tensor_parallel_ffn_sharding(rng):
    """2D (data x model) mesh: FFN hidden dim sharded, forward matches replicated."""
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from unimatch_tpu.parallel.shardings import make_mesh_2d, shard_params

    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model = UniMatch(config=cfg)
    img = jnp.asarray((rng.rand(4, 32, 48, 3) * 255).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), img, img, infer=infer)

    ref = model.apply(variables, img, img, infer=infer)["flow_preds"][-1]

    mesh = make_mesh_2d(4, 2)
    with mesh:
        sharded = {"params": shard_params(mesh, variables["params"])}
        img_s = jax.device_put(img, NamedSharding(mesh, P("data")))

        @jax.jit
        def fwd(v, a, b):
            return model.apply(v, a, b, infer=infer)["flow_preds"][-1]

        out = fwd(sharded, img_s, img_s)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_train_step_8dev_swin_spatial(rng, monkeypatch):
    """DP train step with the fused spatial swin path enabled: the
    custom_vjp twin differentiates under pjit and matches single-device."""
    monkeypatch.setenv("UNIMATCH_SWIN_SPATIAL", "1")
    cfg = ModelConfig(task="flow", num_scales=1)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,), prop_radius_list=(-1,))
    model = UniMatch(config=cfg)
    batch = _flow_batch(rng, 8, 32, 48)

    state0 = create_train_state(model, jax.random.PRNGKey(0), batch, infer)
    step_1 = make_train_step(model, infer)
    state_1, m1 = step_1(state0, jax.tree.map(jnp.asarray, batch))

    state0b = create_train_state(model, jax.random.PRNGKey(0), batch, infer)
    mesh = make_mesh(jax.devices())
    with mesh:
        sbatch = shard_batch(mesh, batch)
        step_8 = make_train_step(model, infer, mesh=mesh)
        state_8, m8 = step_8(state0b, sbatch)

    np.testing.assert_allclose(float(m8["loss"]), float(m1["loss"]), rtol=2e-5)
    # atol matches test_train_step_8dev_matches_single: the worst deviation
    # (1.87e-5 abs on backbone/layer1_1/conv1, 1 of 36,864 elements) is
    # BIT-IDENTICAL with UNIMATCH_SWIN_SPATIAL=0 on this host (round-5
    # diagnosis) — generic 8-way all-reduce reduction-order rounding in the
    # backbone gradient, not the fused-swin custom_vjp path this test guards.
    for a, b in zip(jax.tree.leaves(state_1.params), jax.tree.leaves(state_8.params)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a), rtol=1e-4, atol=5e-5)
