"""On-TPU round-3j batch: compact tiled-volume timings + parity, fused
motion-encoder parity + A/B (rerun of 3i, which was cut off by a relay
outage), backbone conv-form re-probes, depth FFN A/B.
Emits to /tmp/tpu_r3j_results.jsonl."""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = "/tmp/tpu_r3j_results.jsonl"


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


def stage_volume_compact():
    """Compact tiled volume (zero ring dropped, 162 -> 120 units/pixel):
    build + lookup timings and on-chip parity vs the direct gather path.
    Round-3 pre-compaction numbers: build 11.4 ms, build + 6 lookups 23.8."""
    import unimatch_tpu.ops.correlation as C

    f0 = bf(1, 112, 256, 128)
    f1 = bf(1, 112, 256, 128)
    flow = bf(1, 112, 256, 2, scale=8.0)

    def build_only(a, b):
        return C.build_tiled_correlation_volume(a, b, 4).vt

    def build_plus_6(a, b, f):
        vol = C.build_tiled_correlation_volume(a, b, 4)
        out = jnp.zeros((), jnp.float32)
        ff = f
        for _ in range(6):
            corr = C.local_correlation_with_flow_from_tiled_volume(vol, ff, 4)
            out = out + corr.astype(jnp.float32).mean()
            ff = ff + 0.5
        return out

    res = {}
    res["build_ms"] = [
        round(time_chained(build_only, f0, f1, n=10,
                           min_warmup_s=8 if i == 0 else 0) * 1e3, 2)
        for i in range(2)
    ]
    res["build_plus_6_lookups_ms"] = [
        round(time_chained(build_plus_6, f0, f1, flow, n=10, warmup=1) * 1e3, 2)
        for _ in range(2)
    ]
    emit(part="volume_compact_timing", **res,
         vt_shape=list(jax.eval_shape(build_only, f0, f1).shape))

    direct = jax.jit(lambda: C.local_correlation_with_flow(f0, f1, flow, 4))()
    via = jax.jit(
        lambda: C.local_correlation_with_flow_from_tiled_volume(
            C.build_tiled_correlation_volume(f0, f1, 4), flow, 4
        )
    )()
    d = jnp.abs(via.astype(jnp.float32) - direct.astype(jnp.float32)).max()
    emit(part="volume_compact_parity", max_abs_diff=float(d),
         ref_absmax=float(jnp.abs(direct.astype(jnp.float32)).max()))


def stage_motion_parity():
    from unimatch_tpu.models.reg_refine import BasicMotionEncoder

    enc = BasicMotionEncoder(flow_channels=2)
    flow = bf(1, 112, 256, 2, scale=3.0)
    corr = bf(1, 112, 256, 81)
    os.environ["UNIMATCH_FUSE_MOTION"] = "0"
    params = enc.init(jax.random.PRNGKey(0), flow, corr)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    b = jax.jit(lambda: enc.apply(params, flow, corr)[0])()
    os.environ["UNIMATCH_FUSE_MOTION"] = "1"
    a = jax.jit(lambda: enc.apply(params, flow, corr)[0])()
    d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    emit(part="motion_parity", max_abs_diff=d,
         ref_absmax=float(jnp.abs(b.astype(jnp.float32)).max()))


def stage_update_ab():
    from unimatch_tpu.models.reg_refine import BasicUpdateBlock

    blk = BasicUpdateBlock(downsample_factor=4, flow_dim=2, bilinear_up=False)
    net, inp = bf(1, 112, 256, 128), bf(1, 112, 256, 128)
    corr, flow = bf(1, 112, 256, 81), bf(1, 112, 256, 2)
    os.environ["UNIMATCH_FUSE_MOTION"] = "0"
    params = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def mk(tag):
        def fwd6(p, net, inp, corr, flow):
            f, mask = flow, None
            for _ in range(6):
                _, mask, delta = blk.apply(p, net, inp, corr, f)
                f = f + delta
            return f, mask.astype(jnp.float32).sum()

        fwd6.__name__ += tag
        return fwd6

    f6a, f6b = mk("_motion"), mk("_xla")
    res = {}
    for rep in range(2):
        os.environ["UNIMATCH_FUSE_MOTION"] = "1"
        res.setdefault("motion_x6", []).append(round(time_chained(
            f6a, params, net, inp, corr, flow, n=10,
            min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_MOTION"] = "0"
        res.setdefault("xla_x6", []).append(round(time_chained(
            f6b, params, net, inp, corr, flow, n=10, warmup=2) * 1e3, 2))
    emit(part="update_motion_ab", **res)


def stage_forward_ab():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    os.environ["UNIMATCH_FUSE_MOTION"] = "0"
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mkf(tag):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ += tag
        return fwd

    # three arms: XLA refine convs, fused motion encoder, fused motion +
    # banded flow/mask-head convs (a NEW in-situ configuration: round 3's
    # banded-conv tie also covered the motion encoder; with the motion chain
    # in its own kernel the banded kernel now covers only the heads, where
    # it won isolated)
    fa, fb, fc = mkf("_motion"), mkf("_xla"), mkf("_motion_conv")
    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_FUSE_MOTION"] = "1"
        os.environ["UNIMATCH_FUSE_CONV"] = "0"
        res.setdefault("motion_ms", []).append(round(time_chained(
            fa, params, img0, img1, n=12,
            min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_FUSE_MOTION"] = "0"
        res.setdefault("xla_ms", []).append(round(time_chained(
            fb, params, img0, img1, n=12, warmup=1) * 1e3, 1))
        os.environ["UNIMATCH_FUSE_MOTION"] = "1"
        os.environ["UNIMATCH_FUSE_CONV"] = "1"
        res.setdefault("motion_conv_ms", []).append(round(time_chained(
            fc, params, img0, img1, n=12, warmup=1) * 1e3, 1))
    os.environ["UNIMATCH_FUSE_MOTION"] = "0"
    os.environ["UNIMATCH_FUSE_CONV"] = "0"
    emit(part="forward_motion_ab", **res,
         motion_best_pairs_per_sec=round(1000.0 / min(res["motion_ms"]), 2),
         xla_best_pairs_per_sec=round(1000.0 / min(res["xla_ms"]), 2),
         motion_conv_best_pairs_per_sec=round(1000.0 / min(res["motion_conv_ms"]), 2))


def stage_swin_spatial():
    """Relayout-free spatial swin attention: on-chip parity + transformer A/B
    + full-forward A/B (UNIMATCH_SWIN_SPATIAL arms)."""
    from unimatch_tpu.models.transformer import FeatureTransformer

    model = FeatureTransformer(num_layers=6, d_model=128, ffn_dim_expansion=4)
    f0 = bf(1, 112, 256, 128)
    f1 = bf(1, 112, 256, 128)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(0), f0, f1, attn_type="swin", attn_num_splits=8),
    )

    def mk(tag):
        def fwd(p, a, b):
            x, y = model.apply(p, a, b, attn_type="swin", attn_num_splits=8)
            return x, y

        fwd.__name__ += tag
        return fwd

    fa, fb = mk("_spatial"), mk("_split")
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
    a0, _ = jax.jit(lambda: model.apply(params, f0, f1, attn_type="swin", attn_num_splits=8))()
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    b0, _ = jax.jit(lambda: model.apply(params, f0, f1, attn_type="swin", attn_num_splits=8))()
    emit(part="swin_spatial_parity",
         max_abs_diff=float(jnp.abs(a0.astype(jnp.float32) - b0.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(b0.astype(jnp.float32)).max()))

    res = {}
    for rep in range(2):
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
        res.setdefault("spatial_ms", []).append(round(time_chained(
            fa, params, f0, f1, n=12, min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
        res.setdefault("split_ms", []).append(round(time_chained(
            fb, params, f0, f1, n=12, warmup=2) * 1e3, 2))
    emit(part="swin_spatial_transformer_ab", **res)

    # s0-shaped parity: window L = 1792 exercises the row-sub-blocked kernels
    g0, g1 = bf(1, 56, 128, 128), bf(1, 56, 128, 128)
    p0 = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16),
        model.init(jax.random.PRNGKey(1), g0, g1, attn_type="swin", attn_num_splits=2),
    )
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
    sa, _ = jax.jit(lambda: model.apply(p0, g0, g1, attn_type="swin", attn_num_splits=2))()
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    sb, _ = jax.jit(lambda: model.apply(p0, g0, g1, attn_type="swin", attn_num_splits=2))()
    emit(part="swin_spatial_blocked_parity",
         max_abs_diff=float(jnp.abs(sa.astype(jnp.float32) - sb.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(sb.astype(jnp.float32)).max()))

    # full flagship forward A/B
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    um = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    p = um.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, p)

    def mkf(tag):
        def fwd(pp, a, b):
            return um.apply(pp, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ += tag
        return fwd

    ga, gb = mkf("_spatial"), mkf("_split")
    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
        res.setdefault("spatial_ms", []).append(round(time_chained(
            ga, p, img0, img1, n=12, min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
        res.setdefault("split_ms", []).append(round(time_chained(
            gb, p, img0, img1, n=12, warmup=1) * 1e3, 1))
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    emit(part="swin_spatial_forward_ab", **res,
         spatial_best_pairs_per_sec=round(1000.0 / min(res["spatial_ms"]), 2),
         split_best_pairs_per_sec=round(1000.0 / min(res["split_ms"]), 2))


def stage_conv_form_probe():
    """Re-probe conv forms at the two heaviest backbone shapes:
    conv_via_matmul (K f32 tap partials), im2col (one wide-K dot), and
    lax.conv_general_dilated (round-1 measured it erratically 10-25x off
    peak, bimodal across compiles; XLA may have moved)."""
    from unimatch_tpu.models.layers import conv_via_matmul

    shapes = [((1, 224, 512, 64), 64), ((1, 112, 256, 96), 96)]
    res = {}
    for (shape, cout) in shapes:
        x = bf(*shape)
        k = bf(3, 3, shape[-1], cout, scale=0.05)
        tag = f"{shape[1]}x{shape[2]}x{shape[3]}"

        def via_matmul(a, kk):
            return conv_via_matmul(a, kk, (1, 1), (1, 1))

        def via_im2col(a, kk):
            return conv_via_matmul(a, kk, (1, 1), (1, 1))

        def via_laxconv(a, kk):
            return jax.lax.conv_general_dilated(
                a, kk, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32,
            ).astype(a.dtype)

        via_laxconv.__name__ = "laxconv_" + tag
        via_matmul.__name__ = "matmul_" + tag
        via_im2col.__name__ = "im2col_" + tag
        for rep in range(2):
            os.environ["UNIMATCH_CONV_IM2COL"] = "0"
            res.setdefault(f"matmul_{tag}", []).append(round(time_chained(
                via_matmul, x, k, n=20,
                min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
            os.environ["UNIMATCH_CONV_IM2COL"] = "1"
            res.setdefault(f"im2col_{tag}", []).append(round(time_chained(
                via_im2col, x, k, n=20, warmup=2) * 1e3, 2))
            os.environ["UNIMATCH_CONV_IM2COL"] = "0"
            res.setdefault(f"laxconv_{tag}", []).append(round(time_chained(
                via_laxconv, x, k, n=20, warmup=2) * 1e3, 2))
    emit(part="conv_form_probe", **res)

    # whole-backbone A/B: im2col interior convs vs tap partials
    from unimatch_tpu.models.backbone import CNNEncoder

    img = jnp.asarray(np.random.RandomState(3).rand(2, 448, 1024, 3) * 255, jnp.bfloat16)
    bb = CNNEncoder(output_dim=128, num_output_scales=2)
    os.environ["UNIMATCH_CONV_IM2COL"] = "0"
    pb = jax.tree.map(lambda a: a.astype(jnp.bfloat16), bb.init(jax.random.PRNGKey(0), img))

    def mkb(tag):
        def fwd(p, a):
            return bb.apply(p, a)

        fwd.__name__ += tag
        return fwd

    ba, bc, bd = mkb("_im2col"), mkb("_taps"), mkb("_strided")
    res2 = {}
    for rep in range(2):
        os.environ["UNIMATCH_CONV_IM2COL"] = "1"
        res2.setdefault("im2col_ms", []).append(round(time_chained(
            ba, pb, img, n=12, min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_CONV_IM2COL"] = "0"
        res2.setdefault("taps_ms", []).append(round(time_chained(
            bc, pb, img, n=12, warmup=2) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_STRIDED"] = "1"
        res2.setdefault("strided_ms", []).append(round(time_chained(
            bd, pb, img, n=12, warmup=2) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_STRIDED"] = "0"
    emit(part="backbone_im2col_ab", **res2)

    # strided-conv kernel parity on chip (stem shape)
    from unimatch_tpu.models.layers import conv_via_matmul

    xi = jnp.asarray(np.random.RandomState(5).rand(1, 448, 1024, 3), jnp.bfloat16)
    ks = bf(7, 7, 3, 64, scale=0.1)
    os.environ["UNIMATCH_FUSE_STRIDED"] = "0"
    r0 = jax.jit(lambda a, k: conv_via_matmul(a, k, (2, 2), (3, 3)))(xi, ks)
    os.environ["UNIMATCH_FUSE_STRIDED"] = "1"
    r1 = jax.jit(lambda a, k: conv_via_matmul(a, k, (2, 2), (3, 3)))(xi, ks)
    os.environ["UNIMATCH_FUSE_STRIDED"] = "0"
    emit(part="strided_conv_parity",
         max_abs_diff=float(jnp.abs(r1.astype(jnp.float32) - r0.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(r0.astype(jnp.float32)).max()))


def stage_local_corr():
    """Fused streaming-softmax local correlation: parity + isolated A/B at
    the flagship s1 shape + full-forward A/B."""
    import unimatch_tpu.ops.correlation as C

    f0 = bf(1, 112, 256, 128)
    f1 = bf(1, 112, 256, 128)

    os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "1"
    a = jax.jit(lambda: C.local_correlation_softmax_flow(f0, f1, 4))()
    os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "0"
    b = jax.jit(lambda: C.local_correlation_softmax_flow(f0, f1, 4))()
    emit(part="local_corr_parity",
         max_abs_diff=float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(b.astype(jnp.float32)).max()))

    def mk(tag):
        def fn(x, y):
            return C.local_correlation_softmax_flow(x, y, 4)

        fn.__name__ += tag
        return fn

    fa, fb = mk("_fused"), mk("_xla")
    res = {}
    for rep in range(2):
        os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "1"
        res.setdefault("fused_ms", []).append(round(time_chained(
            fa, f0, f1, n=16, min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "0"
        res.setdefault("xla_ms", []).append(round(time_chained(
            fb, f0, f1, n=16, warmup=2) * 1e3, 2))
    emit(part="local_corr_isolated_ab", **res)

    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )

    def mkf(tag):
        def fwd(p, x, y):
            return model.apply(p, x, y, infer=infer)["flow_preds"][-1]

        fwd.__name__ += tag
        return fwd

    ga, gb = mkf("_lcfused"), mkf("_lcxla")
    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "1"
        os.environ["UNIMATCH_FUSE_LOCAL_PROP"] = "1"
        os.environ["UNIMATCH_FUSE_UPSAMPLE"] = "1"
        res.setdefault("fused_ms", []).append(round(time_chained(
            ga, params, img0, img1, n=12,
            min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "0"
        os.environ["UNIMATCH_FUSE_LOCAL_PROP"] = "0"
        os.environ["UNIMATCH_FUSE_UPSAMPLE"] = "0"
        res.setdefault("xla_ms", []).append(round(time_chained(
            gb, params, img0, img1, n=12, warmup=1) * 1e3, 1))
    os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "0"
    os.environ["UNIMATCH_FUSE_LOCAL_PROP"] = "0"
    os.environ["UNIMATCH_FUSE_UPSAMPLE"] = "0"
    emit(part="local_corr_forward_ab", **res,
         fused_best_pairs_per_sec=round(1000.0 / min(res["fused_ms"]), 2),
         xla_best_pairs_per_sec=round(1000.0 / min(res["xla_ms"]), 2))


def stage_combined_winners():
    """Re-measure the full flagship forward with every lever that WON its
    individual A/B enabled together (interactions are real: pallas_call is
    a fusion barrier — see the banded-conv lesson in docs/PERF_NOTES.md)."""
    results = {}
    with open(OUT) as f:
        for line in f:
            try:
                d = json.loads(line)
                results[d.get("part", "")] = d
            except Exception:  # noqa: BLE001
                pass

    def won(part, a_key, b_key):
        d = results.get(part)
        if not d or a_key not in d or b_key not in d:
            return False
        return min(d[a_key]) < min(d[b_key])

    flags = {
        "UNIMATCH_FUSE_MOTION": "1" if won("forward_motion_ab", "motion_ms", "xla_ms") else "0",
        "UNIMATCH_SWIN_SPATIAL": "1" if won("swin_spatial_forward_ab", "spatial_ms", "split_ms") else "0",
        "UNIMATCH_CONV_IM2COL": "1" if won("backbone_im2col_ab", "im2col_ms", "taps_ms") else "0",
        "UNIMATCH_FUSE_STRIDED": "1" if won("backbone_im2col_ab", "strided_ms", "taps_ms") else "0",
        "UNIMATCH_FUSE_LOCAL_CORR": "1" if won("local_corr_forward_ab", "fused_ms", "xla_ms") else "0",
        "UNIMATCH_FUSE_LOCAL_PROP": "1" if won("local_corr_forward_ab", "fused_ms", "xla_ms") else "0",
        "UNIMATCH_FUSE_UPSAMPLE": "1" if won("local_corr_forward_ab", "fused_ms", "xla_ms") else "0",
    }
    if won("forward_motion_ab", "motion_conv_ms", "motion_ms") and flags["UNIMATCH_FUSE_MOTION"] == "1":
        flags["UNIMATCH_FUSE_CONV"] = "1"
    for k, v in flags.items():
        os.environ[k] = v

    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def fwd_combined(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    ms = [round(time_chained(
        fwd_combined, params, img0, img1, n=12,
        min_warmup_s=8 if i == 0 else 0) * 1e3, 1) for i in range(4)]
    emit(part="combined_winners", flags=flags, ms=ms,
         best_pairs_per_sec=round(1000.0 / min(ms), 2),
         median_ms=sorted(ms)[len(ms) // 2])
    for k in flags:
        os.environ[k] = "0"


def stage_depth_ffn():
    import subprocess

    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "tpu_round3h_depth_ffn.py")],
        capture_output=True, text=True, timeout=3000,
    )
    print(r.stdout[-2000:], r.stderr[-1000:], flush=True)


if __name__ == "__main__":
    emit(part="session", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    guarded(stage_volume_compact)
    guarded(stage_motion_parity)
    guarded(stage_update_ab)
    guarded(stage_forward_ab)
    guarded(stage_swin_spatial)
    guarded(stage_conv_form_probe)
    guarded(stage_local_corr)
    guarded(stage_combined_winners)
    guarded(stage_depth_ffn)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
