"""Round-4 consolidated on-chip batch D (supersedes running 4b then 4c).

Stages are ordered by DECISION value so a slow relay session still settles
the default flags even if it never reaches the informational tail:

  1. flagship_all_ab     flagship forward, interleaved solo/combo arms for
                         every round-4 lever: fused two-conv head
                         (kernels/head_fused.py), bf16 conv partials
                         (models/layers.py), streaming local corr/prop/
                         upsample (kernels/local_corr.py, upsample_fused.py).
                         Per-arm end-to-end parity vs default at rep 0.
  2. stereo_all_ab       gmstereo_scale2_regrefine3: default vs all levers
                         (exercises the 1-D streaming corr variant).
  3. depth_breakdown     GMDepth-scale1 480x640 stage timings (the 1.44x
                         laggard's next lever).
  4. flagship_breakdown  isolated stage timings at bench shape with current
                         defaults (backbone / transformer-s1 / volume build
                         +lookups / fused update x6 / upsample).
  5. kernel_parity       per-kernel on-chip parity at flagship shapes (the
                         e2e parity in stage 1 is the acceptance bound;
                         these are for diagnosis).

Appends JSON lines to /tmp/tpu_r4d_results.jsonl.
"""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()

from unimatch_tpu.utils.benchmark import time_chained  # noqa: E402

OUT = "/tmp/tpu_r4d_results.jsonl"

STREAM = {"UNIMATCH_FUSE_LOCAL_CORR": "1", "UNIMATCH_FUSE_LOCAL_PROP": "1",
          "UNIMATCH_FUSE_UPSAMPLE": "1"}
TOUCHED = ("UNIMATCH_FUSE_HEAD", "UNIMATCH_CONV_BF16_PARTIALS") + tuple(STREAM)


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def guarded(fn, *args):
    t0 = time.time()
    try:
        fn(*args)
        emit(part=fn.__name__, status="done", wall_s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        emit(part=fn.__name__, status="error", error=repr(e)[:400])


def set_flags(overrides):
    for k in TOUCHED:
        os.environ.pop(k, None)
    os.environ.update(overrides)


def _forward_ab(tag, cfg_pair, shape, arms):
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfg_pair
    model = UniMatch(config=cfg)
    h, w = shape
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, h, w, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, h, w, 3) * 255, jnp.bfloat16)
    set_flags({})
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mk(name):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ = f"{tag}_{name}"
        return fwd

    res, outs, failed = {}, {}, {}
    try:
        for rep in range(3):
            for name, overrides in arms.items():
                if name in failed:
                    continue
                try:
                    set_flags(overrides)
                    dt = time_chained(mk(name), params, img0, img1, n=12,
                                      min_warmup_s=8 if rep == 0 else 0, warmup=2)
                    res.setdefault(f"{name}_ms", []).append(round(dt * 1e3, 1))
                    if rep == 0:
                        outs[name] = jax.jit(mk(name))(params, img0, img1).astype(jnp.float32)
                        emit(part=f"{tag}_progress", arm=name,
                             ms=res[f"{name}_ms"][-1])
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    failed[name] = repr(e)[:200]
                    emit(part=f"{tag}_progress", arm=name, error=repr(e)[:200])
    finally:
        set_flags({})
    parity = {}
    base_name = next(iter(arms))
    for name, o in outs.items():
        if name != base_name and base_name in outs:
            parity[f"{name}_parity"] = round(float(jnp.abs(o - outs[base_name]).max()), 4)
    if base_name in outs:
        parity["base_absmax"] = round(float(jnp.abs(outs[base_name]).max()), 4)
    emit(part=tag, **res, **parity, **({"failed": failed} if failed else {}))


def stage_flagship_all():
    from unimatch_tpu import config as cfgs

    _forward_ab(
        "flagship_all_ab", cfgs.GMFLOW_SCALE2_REGREFINE6, (448, 1024),
        {
            "default": {},
            "head": {"UNIMATCH_FUSE_HEAD": "1"},
            "bf16p": {"UNIMATCH_CONV_BF16_PARTIALS": "1"},
            "hb": {"UNIMATCH_FUSE_HEAD": "1", "UNIMATCH_CONV_BF16_PARTIALS": "1"},
            "stream": dict(STREAM),
            "all": {"UNIMATCH_FUSE_HEAD": "1",
                    "UNIMATCH_CONV_BF16_PARTIALS": "1", **STREAM},
        },
    )


def stage_stereo_all():
    from unimatch_tpu import config as cfgs

    _forward_ab(
        "stereo_all_ab", cfgs.GMSTEREO_SCALE2_REGREFINE3, (384, 1248),
        {
            "default": {},
            "all": {"UNIMATCH_FUSE_HEAD": "1",
                    "UNIMATCH_CONV_BF16_PARTIALS": "1", **STREAM},
        },
    )


def stage_depth_breakdown():
    """GMDepth-scale1 480x640: isolated stage timings to find the laggard."""
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch
    from unimatch_tpu.models.backbone import CNNEncoder
    from unimatch_tpu.models.transformer import FeatureTransformer
    from unimatch_tpu.models.propagation import SelfAttnPropagation
    from unimatch_tpu.ops import correlation as C

    set_flags({})
    cfg, infer = cfgs.GMDEPTH_SCALE1
    model = UniMatch(config=cfg)
    h, w = 480, 640
    rng = np.random.RandomState(1)
    img0 = jnp.asarray(rng.rand(1, h, w, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(rng.rand(1, h, w, 3) * 255, jnp.bfloat16)
    K = jnp.asarray(
        np.array([[[520.0, 0, w / 2], [0, 520.0, h / 2], [0, 0, 1]]], np.float32)
    )
    pose = np.eye(4, dtype=np.float32)[None]
    pose[:, 0, 3] = 0.1
    pose = jnp.asarray(pose)
    extra = {"intrinsics": K, "pose": pose}
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer, **extra)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    res = {}

    def fwd(p, a, b):
        return model.apply(p, a, b, infer=infer, **extra)["flow_preds"][-1]

    for rep in range(2):
        res.setdefault("full_ms", []).append(round(time_chained(
            fwd, params, img0, img1, n=32,
            min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))

    # isolated stages at feature shape [1, 60, 80, 128]
    fh, fw, c = 60, 80, 128
    f0 = jnp.asarray(rng.randn(1, fh, fw, c), jnp.bfloat16)
    f1 = jnp.asarray(rng.randn(1, fh, fw, c), jnp.bfloat16)
    Kf = K * jnp.asarray([[1 / 8], [1 / 8], [1.0]], jnp.float32)[None]

    bb = CNNEncoder(output_dim=128, num_output_scales=1)
    xcat = jnp.concatenate([img0, img1], 0)
    pbb = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      bb.init(jax.random.PRNGKey(0), xcat))
    res["backbone_ms"] = round(time_chained(
        lambda p, t: bb.apply(p, t)[-1], pbb, xcat, n=24,
        min_warmup_s=8, warmup=2) * 1e3, 2)

    tr = FeatureTransformer(num_layers=6, d_model=128, ffn_dim_expansion=4)
    ptr = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      tr.init(jax.random.PRNGKey(0), f0, f1,
                              attn_type="swin", attn_num_splits=2))
    res["transformer_ms"] = round(time_chained(
        lambda p, a, b: tr.apply(p, a, b, attn_type="swin", attn_num_splits=2)[0],
        ptr, f0, f1, n=24, min_warmup_s=8, warmup=2) * 1e3, 2)

    cand = jnp.broadcast_to(
        jnp.linspace(infer.min_depth, infer.max_depth, 64, dtype=jnp.float32)[None, :, None, None],
        (1, 64, fh, fw),
    )
    res["plane_sweep_ms"] = round(time_chained(
        lambda a, b, kk, po, cc: C.correlation_softmax_depth(a, b, kk, po, cc)[0],
        f0, f1, Kf, pose, cand, n=24, min_warmup_s=8, warmup=2) * 1e3, 2)

    prop = SelfAttnPropagation(in_channels=c)
    dflow = jnp.asarray(rng.rand(1, fh, fw, 1), jnp.bfloat16)
    pprop = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                        prop.init(jax.random.PRNGKey(0), f0, dflow,
                                  local_window_attn=False, local_window_radius=-1))
    res["propagation_ms"] = round(time_chained(
        lambda p, a, d: prop.apply(p, a, d, local_window_attn=False,
                                   local_window_radius=-1),
        pprop, f0, dflow, n=24, min_warmup_s=8, warmup=2) * 1e3, 2)

    emit(part="depth_breakdown", **res)


def stage_flagship_breakdown():
    """Bench-shape stage timings with CURRENT defaults (fused motion + swin
    + GRU + FFN, compact tiled volume) — the big unknowns only."""
    from unimatch_tpu.models.backbone import CNNEncoder
    from unimatch_tpu.models.transformer import FeatureTransformer
    from unimatch_tpu.models.reg_refine import BasicUpdateBlock
    from unimatch_tpu.ops import correlation as C
    from unimatch_tpu.ops.upsample import upsample_with_mask

    set_flags({})
    rng = np.random.RandomState(3)

    def bf(*shape, scale=1.0):
        return jnp.asarray(rng.randn(*shape) * scale, jnp.bfloat16)

    res = {}

    x = bf(2, 448, 1024, 3, scale=50.0)
    enc = CNNEncoder(output_dim=128, num_output_scales=2)
    pe = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      enc.init(jax.random.PRNGKey(0), x))
    res["backbone_ms"] = [round(time_chained(
        lambda p, t: enc.apply(p, t)[-1], pe, x, n=20,
        min_warmup_s=8 if i == 0 else 0, warmup=2) * 1e3, 2) for i in range(2)]

    f0 = bf(1, 112, 256, 128)
    f1 = bf(1, 112, 256, 128)
    flow = bf(1, 112, 256, 2, scale=5.0)
    tr = FeatureTransformer(num_layers=6, d_model=128, ffn_dim_expansion=4)
    pt = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      tr.init(jax.random.PRNGKey(0), f0, f1,
                              attn_type="swin", attn_num_splits=8))
    res["transformer_s1_ms"] = [round(time_chained(
        lambda p, a, b: tr.apply(p, a, b, attn_type="swin", attn_num_splits=8)[0],
        pt, f0, f1,
        n=20, min_warmup_s=8 if i == 0 else 0, warmup=2) * 1e3, 2) for i in range(2)]

    def build_plus_6(a, b, f):
        vol = C.build_tiled_correlation_volume(a, b, 4)
        out = jnp.zeros((), jnp.float32)
        ff = f
        for _ in range(6):
            corr = C.local_correlation_with_flow_from_tiled_volume(vol, ff, 4)
            out = out + corr.astype(jnp.float32).mean()
            ff = ff + 0.5
        return out

    res["volume_build_ms"] = [round(time_chained(
        lambda a, b: C.build_tiled_correlation_volume(a, b, 4).vt, f0, f1, n=10,
        min_warmup_s=8 if i == 0 else 0, warmup=1) * 1e3, 2) for i in range(2)]
    res["volume_build_plus6_ms"] = [round(time_chained(
        build_plus_6, f0, f1, flow, n=10, warmup=1) * 1e3, 2) for _ in range(2)]

    blk = BasicUpdateBlock(downsample_factor=4, flow_dim=2, bilinear_up=False)
    net, inp = bf(1, 112, 256, 128), bf(1, 112, 256, 128)
    corr = bf(1, 112, 256, 81)
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      blk.init(jax.random.PRNGKey(0), net, inp, corr, flow))

    def upd6(p, net, inp, corr, flow):
        f = flow
        mask = None
        for _ in range(6):
            _, mask, delta = blk.apply(p, net, inp, corr, f)
            f = f + delta
        return f, mask.astype(jnp.float32).sum()

    res["update_x6_ms"] = [round(time_chained(
        upd6, pb, net, inp, corr, flow, n=10,
        min_warmup_s=8 if i == 0 else 0, warmup=1) * 1e3, 2) for i in range(2)]

    mask = bf(1, 112, 256, 144)
    res["upsample_ms"] = [round(time_chained(
        lambda f, m: upsample_with_mask(f, m, 4), flow, mask, n=20,
        warmup=2) * 1e3, 2) for _ in range(2)]

    emit(part="flagship_breakdown", **res)


def stage_kernel_parity():
    from unimatch_tpu.kernels.head_fused import fused_head, _reference_head
    from unimatch_tpu.kernels.local_corr import (
        _local_corr_flow_impl, _reference_flow, _local_prop_impl, _reference_prop,
    )
    from unimatch_tpu.kernels.upsample_fused import _upsample_impl, _reference

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, 128, 256) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(256) * 0.1, jnp.bfloat16)
    for tag, (kh2, kw2, cout) in (("flow", (3, 3, 2)), ("mask", (1, 1, 144))):
        k2 = jnp.asarray(rng.randn(kh2, kw2, 256, cout) * 0.05, jnp.bfloat16)
        b2 = jnp.asarray(rng.randn(cout) * 0.1, jnp.bfloat16)
        got = jax.jit(lambda k2=k2, b2=b2: fused_head(x, k1, b1, k2, b2))()
        ref = jax.jit(
            lambda k2=k2, b2=b2: _reference_head(x, k1, b1, k2, b2, 3, 3, kh2, kw2, "relu")
        )()
        emit(part=f"head_parity_{tag}",
             max_abs_diff=float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()),
             ref_absmax=float(jnp.abs(ref.astype(jnp.float32)).max()))

    f0 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    f1 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    got = jax.jit(lambda a, b: _local_corr_flow_impl(a, b, 4))(f0, f1)
    ref = jax.jit(lambda a, b: _reference_flow(a, b, 4))(f0, f1)
    emit(part="local_corr_parity",
         max_abs_diff=float(jnp.abs(got - ref).max()),
         ref_absmax=float(jnp.abs(ref).max()))

    q = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 112, 256, 2) * 3, jnp.bfloat16)
    got = jax.jit(lambda a, b, c: _local_prop_impl(a, b, c, 1))(q, k, v)
    ref = jax.jit(lambda a, b, c: _reference_prop(a, b, c, 1))(q, k, v)
    emit(part="local_prop_parity",
         max_abs_diff=float(jnp.abs(got - ref).max()),
         ref_absmax=float(jnp.abs(ref).max()))

    flow = jnp.asarray(rng.randn(1, 112, 256, 2) * 5, jnp.bfloat16)
    mask = jnp.asarray(rng.randn(1, 112, 256, 144), jnp.bfloat16)
    got = jax.jit(lambda f, m: _upsample_impl(f, m, 4, False))(flow, mask)
    ref = jax.jit(lambda f, m: _reference(f, m, 4, False))(flow, mask)
    emit(part="upsample_parity",
         max_abs_diff=float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(ref.astype(jnp.float32)).max()))


if __name__ == "__main__":
    emit(part="session_r4d", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    guarded(stage_flagship_all)
    guarded(stage_stereo_all)
    guarded(stage_depth_breakdown)
    guarded(stage_flagship_breakdown)
    guarded(stage_kernel_parity)
    emit(part="session_r4d", status="complete", end=time.strftime("%H:%M:%S"))
