"""On-TPU round-3k: GMDepth-scale1 stage breakdown + spatial-swin A/B at the
depth shape. The depth variant is the weakest (1.44x A100 in the round-3
re-measure); this locates its cost before any kernel work.
Emits to /tmp/tpu_r3k_results.jsonl."""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = "/tmp/tpu_r3k_results.jsonl"


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def guarded(fn):
    t0 = time.time()
    try:
        fn()
        emit(part=fn.__name__, status="done", wall_s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        emit(part=fn.__name__, status="error", error=repr(e)[:400])


from unimatch_tpu.utils.benchmark import time_chained  # noqa: E402

RNG = np.random.RandomState(0)


def bf(*shape, scale=1.0):
    return jnp.asarray(RNG.randn(*shape) * scale, jnp.bfloat16)


def _depth_inputs():
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 480, 640, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 480, 640, 3) * 255, jnp.bfloat16)
    intr = jnp.asarray([[[500.0, 0, 320], [0, 500.0, 240], [0, 0, 1]]], jnp.float32)
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[None]).at[:, 0, 3].set(0.12)
    return img0, img1, intr, pose


def stage_depth_stages():
    """Isolated stage timings at the depth bench shape (dispatch overhead
    ~1-3 ms rides on each; only ratios matter)."""
    from unimatch_tpu.models.backbone import CNNEncoder
    from unimatch_tpu.models.transformer import FeatureTransformer
    import unimatch_tpu.ops.correlation as C

    img0, img1, intr, pose = _depth_inputs()
    res = {}

    bb = CNNEncoder(output_dim=128, num_output_scales=1)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      bb.init(jax.random.PRNGKey(0), img0))

    def backbone_both(p, a, b):
        x = jnp.concatenate([a, b], 0)
        return bb.apply(p, (x - 127.5) / 127.5)

    res["backbone_ms"] = [round(time_chained(
        backbone_both, pb, img0, img1, n=12,
        min_warmup_s=8 if i == 0 else 0) * 1e3, 2) for i in range(2)]

    f0 = bf(1, 60, 80, 128)
    f1 = bf(1, 60, 80, 128)
    tr = FeatureTransformer(num_layers=6, d_model=128, ffn_dim_expansion=4)
    pt = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      tr.init(jax.random.PRNGKey(0), f0, f1,
                              attn_type="swin", attn_num_splits=2))

    def tr_fwd(p, a, b):
        return tr.apply(p, a, b, attn_type="swin", attn_num_splits=2)

    res["transformer_ms"] = [round(time_chained(
        tr_fwd, pt, f0, f1, n=12, warmup=2) * 1e3, 2) for _ in range(2)]

    depth_cand = 1.0 / jnp.broadcast_to(
        jnp.linspace(1.0 / 10.0, 1.0 / 0.5, 64, dtype=jnp.float32)[None, :, None, None],
        (1, 64, 60, 80),
    )

    # intrinsics at feature stride 8 (values only need to be plausible —
    # this stage is a timing probe)
    intr_s = intr.at[:, :2].multiply(1.0 / 8.0)

    def sweep2(a, b):
        d, _ = C.correlation_softmax_depth(a, b, intr_s, pose, depth_cand)
        return d

    res["plane_sweep_ms"] = [round(time_chained(
        sweep2, f0, f1, n=12, warmup=2) * 1e3, 2) for _ in range(2)]
    emit(part="depth_stages", **res)


def stage_depth_swin_ab():
    """Full GMDepth-scale1 forward: UNIMATCH_SWIN_SPATIAL arms (windows are
    30x40 = 1200 tokens -> the row-sub-blocked kernels)."""
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMDEPTH_SCALE1
    model = UniMatch(config=cfg)
    img0, img1, intr, pose = _depth_inputs()
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    p = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer,
                   intrinsics=intr, pose=pose)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)

    def mk(tag):
        def fwd(pp, a, b):
            return model.apply(pp, a, b, infer=infer,
                               intrinsics=intr, pose=pose)["flow_preds"][-1]

        fwd.__name__ += tag
        return fwd

    fa, fb = mk("_spatial"), mk("_split")
    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
        res.setdefault("spatial_ms", []).append(round(time_chained(
            fa, p, img0, img1, n=16, min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
        res.setdefault("split_ms", []).append(round(time_chained(
            fb, p, img0, img1, n=16, warmup=2) * 1e3, 1))
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    emit(part="depth_swin_ab", **res)


def stage_stereo_swin_ab():
    """Full GMStereo-scale2-regrefine3 forward: UNIMATCH_SWIN_SPATIAL arms
    (self-attention layers are swin-2D; cross layers stay swin-1D)."""
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMSTEREO_SCALE2_REGREFINE3
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 384, 1248, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 384, 1248, 3) * 255, jnp.bfloat16)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    p = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)

    def mk(tag):
        def fwd(pp, a, b):
            return model.apply(pp, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ += tag
        return fwd

    fa, fb = mk("_spatial"), mk("_split")
    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
        res.setdefault("spatial_ms", []).append(round(time_chained(
            fa, p, img0, img1, n=12, min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
        res.setdefault("split_ms", []).append(round(time_chained(
            fb, p, img0, img1, n=12, warmup=2) * 1e3, 1))
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    emit(part="stereo_swin_ab", **res)


if __name__ == "__main__":
    emit(part="session", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    guarded(stage_depth_stages)
    guarded(stage_depth_swin_ab)
    guarded(stage_stereo_swin_ab)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
