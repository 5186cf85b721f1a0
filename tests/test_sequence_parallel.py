"""Sequence-parallel global matching on the 8-device CPU mesh."""

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.ops import correlation as C
from unimatch_tpu.parallel.mesh import make_mesh
from unimatch_tpu.parallel.sequence_parallel import sp_global_correlation_softmax


def test_sp_global_correlation_matches_single(rng):
    b, h, w, c = 1, 8, 16, 32  # HW = 128 tokens, sharded 8 ways
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    ref, _ = C.global_correlation_softmax(f0, f1)

    mesh = make_mesh(jax.devices(), axis="sp")
    got = sp_global_correlation_softmax(mesh, f0, f1)

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)


def test_sp_full_model_forward_matches_single(rng):
    """The MODEL forward under the sequence_parallel context (global corr +
    global propagation token-sharded over 8 devices) matches single-device."""
    from unimatch_tpu.config import InferenceConfig, ModelConfig
    from unimatch_tpu.models.unimatch import UniMatch
    from unimatch_tpu.parallel.context import sequence_parallel

    cfg = ModelConfig(task="flow", num_scales=1, upsample_factor=8)
    infer = InferenceConfig(attn_splits_list=(2,), corr_radius_list=(-1,),
                            prop_radius_list=(-1,))
    model = UniMatch(config=cfg)

    img0 = jnp.asarray((rng.rand(1, 32, 64, 3) * 255).astype(np.float32))
    img1 = jnp.asarray((rng.rand(1, 32, 64, 3) * 255).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)

    ref = model.apply(params, img0, img1, infer=infer)["flow_preds"][-1]

    mesh = make_mesh(jax.devices(), axis="sp")
    with sequence_parallel(mesh):
        got = model.apply(params, img0, img1, infer=infer)["flow_preds"][-1]

    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # bidirectional flow under sp
    with sequence_parallel(mesh):
        got_bidir = model.apply(params, img0, img1, infer=infer,
                                pred_bidir_flow=True)["flow_preds"][-1]
    ref_bidir = model.apply(params, img0, img1, infer=infer,
                            pred_bidir_flow=True)["flow_preds"][-1]
    np.testing.assert_allclose(np.asarray(got_bidir), np.asarray(ref_bidir),
                               rtol=1e-4, atol=1e-4)


def test_sp_non_divisible_tokens_falls_back(rng):
    """Shapes whose token count does not divide the mesh fall back cleanly."""
    from unimatch_tpu.parallel.context import sequence_parallel

    b, h, w, c = 1, 6, 10, 32  # HW = 60, not divisible by 8
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    ref, _ = C.global_correlation_softmax(f0, f1)
    mesh = make_mesh(jax.devices(), axis="sp")
    with sequence_parallel(mesh):
        got, _ = C.global_correlation_softmax(f0, f1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-6)


def test_sp_stereo_row_volume_matches_single(rng):
    """Sharded per-row stereo correlation == single device (8-way over H)."""
    from unimatch_tpu.parallel.sequence_parallel import (
        sp_global_correlation_softmax_stereo,
    )

    b, h, w, c = 1, 16, 24, 32
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))

    ref, _ = C.global_correlation_softmax_stereo(f0, f1)
    mesh = make_mesh(jax.devices(), axis="sp")
    got = sp_global_correlation_softmax_stereo(mesh, f0, f1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-4)

    # dispatch path: the op itself routes through SP under the context
    from unimatch_tpu.parallel.context import sequence_parallel

    with sequence_parallel(mesh):
        via_ctx, prob = C.global_correlation_softmax_stereo(f0, f1)
    assert prob is None  # SP path does not materialize the volume
    np.testing.assert_allclose(np.asarray(via_ctx), np.asarray(ref), rtol=1e-4, atol=1e-4)


def test_sp_decline_warns_once(rng):
    """A non-divisible token count under an active SP context warns."""
    import warnings as _w

    from unimatch_tpu.parallel.context import sequence_parallel, _warned_declines

    b, h, w, c = 1, 7, 24, 32  # h=7 does not divide 8 devices
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    mesh = make_mesh(jax.devices(), axis="sp")

    _warned_declines.clear()
    with sequence_parallel(mesh):
        with _w.catch_warnings(record=True) as caught:
            _w.simplefilter("always")
            got, _ = C.global_correlation_softmax_stereo(f0, f1)
            C.global_correlation_softmax_stereo(f0, f1)  # second call: no new warning
    msgs = [str(c.message) for c in caught if "sequence-parallel declined" in str(c.message)]
    assert len(msgs) == 1, msgs
    ref, _ = C.global_correlation_softmax_stereo(f0, f1)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_sp_refine_correlation_matches_single(rng):
    """Sharded flow-shifted refine correlation == single device (8-way over H,
    feature1 replicated — the refine loop's hot gather, VERDICT r2 missing #4)."""
    from unimatch_tpu.parallel.context import sequence_parallel
    from unimatch_tpu.parallel.sequence_parallel import sp_local_correlation_with_flow

    b, h, w, c = 1, 16, 24, 32
    f0 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    f1 = jnp.asarray(rng.randn(b, h, w, c).astype(np.float32))
    flow = jnp.asarray((rng.randn(b, h, w, 2) * 3).astype(np.float32))

    ref = C.local_correlation_with_flow(f0, f1, flow, 4)

    mesh = make_mesh(jax.devices(), axis="sp")
    got = sp_local_correlation_with_flow(mesh, f0, f1, flow, 4)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-4, atol=1e-5)

    # ambient-context dispatch inside the op itself
    with sequence_parallel(mesh):
        got_ctx = C.local_correlation_with_flow(f0, f1, flow, 4)
    np.testing.assert_allclose(np.asarray(got_ctx), np.asarray(ref), rtol=1e-4, atol=1e-5)
