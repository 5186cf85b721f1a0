"""Round-5 batch A: fine-grained measurement + cheap lever debuts.

The round-4 verdict leaves a 15.6 ms gap to the 3x north star (56.2 -> 40.6
ms flagship) with three addresses: update net x6 (~19 ms vs a ~5-9 ms
compute floor), volume build (7.5 ms vs a ~3 ms write floor), backbone
(10 ms vs a ~4 ms floor). Every prior structural bet that was built on
modeled (not measured) sub-costs lost; this batch buys the measurements.

  compile_gate       per-variant forward compile at bench shapes with the
                     current default-on kernel set (the d614103 stereo break
                     class surfaces here, VERDICT #7)
  update_pieces      motion / gru-h / gru-v / head x6 isolated at the
                     flagship s1 shape + MXU + HBM-stream + gather probes
  backbone_pieces    stem / per-stage residual blocks / bare IN / bare conv
  volume_ab          build kernel grid-order & block-size variants + XLA
  gru_t_ab           gru vertical pass with T = default/16/32
  prop_ups_compile   one last tiny-shape compile attempt for the streaming
                     propagation + fused upsample kernels (delete on failure)
  profile_trace      jax.profiler.trace + optimized-HLO dump attempt on the
                     (cached) flagship forward

Appends JSON lines to /tmp/tpu_r5a_results.jsonl (committed to
docs/artifacts_round5_tpu.jsonl afterwards — the round-4i results died in
/tmp, per ADVICE.md).
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

OUT = "/tmp/tpu_r5a_results.jsonl"
TOUCHED = (
    "UNIMATCH_VOLUME_GRID", "UNIMATCH_VOLUME_BP", "UNIMATCH_VOLUME_BUILD",
    "UNIMATCH_GRU_T", "UNIMATCH_FUSE_LOCAL_PROP", "UNIMATCH_FUSE_UPSAMPLE",
    "UNIMATCH_FUSE_BB2",
)


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


def _t(fn, *args, n=12, rep0=True):
    return round(time_chained(fn, *args, n=n, min_warmup_s=8 if rep0 else 0,
                              warmup=2) * 1e3, 2)


# ---------------------------------------------------------------------------


def _variant_fwd(cfg_name, shape, bs=1):
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = getattr(cfgs, cfg_name)
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(bs, *shape, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(bs, *shape, 3) * 255, jnp.bfloat16)
    kw = {}
    if cfg.task == "depth":
        pose = np.eye(4, dtype=np.float32)[None]
        pose[:, 0, 3] = 0.1
        kw = dict(
            intrinsics=jnp.asarray(
                [[[520.0, 0, shape[1] / 2], [0, 520.0, shape[0] / 2], [0, 0, 1]]],
                jnp.float32,
            ),
            pose=jnp.asarray(pose),
        )
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer, **kw)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def fwd(p, a, b):
        return model.apply(p, a, b, infer=infer, **kw)["flow_preds"][-1]

    return fwd, params, img0, img1


VARIANTS = (
    ("GMFLOW_SCALE2_REGREFINE6", (448, 1024)),
    ("GMSTEREO_SCALE2_REGREFINE3", (384, 1248)),
    ("GMFLOW_SCALE1", (448, 1024)),
    ("GMFLOW_SCALE2", (448, 1024)),
    ("GMDEPTH_SCALE1", (480, 640)),
)


def stage_compile_gate():
    """Compile + run every variant's forward with the default-on kernel set.

    This is the per-variant Mosaic shape gate (VERDICT round-4 weak #6):
    a default-on kernel whose support gate passes a shape Mosaic rejects
    fails HERE, at batch start, instead of breaking a variant at HEAD.
    """
    set_flags({})
    for cfg_name, shape in VARIANTS:
        t0 = time.time()
        fwd, params, a, b = _variant_fwd(cfg_name, shape)
        out = jax.jit(fwd)(params, a, b)
        jax.block_until_ready(out)
        emit(part="compile_gate", variant=cfg_name, shape=list(shape),
             ok=bool(np.isfinite(np.asarray(out, np.float32)).all()),
             wall_s=round(time.time() - t0, 1))


# ---------------------------------------------------------------------------


def stage_update_pieces():
    """Per-piece update-net costs at the flagship s1 shape, plus hardware
    reference probes (MXU dot, HBM stream, HBM gather row widths)."""
    from unimatch_tpu.kernels.motion_fused import motion_encoder_fused
    from unimatch_tpu.kernels.gru_fused import gru_pass
    from unimatch_tpu.models.layers import conv_via_matmul

    rng = np.random.RandomState(7)
    B, H, W = 1, 112, 256
    dt = jnp.bfloat16
    net = jnp.asarray(rng.randn(B, H, W, 128) * 0.5, dt)
    inp = jnp.asarray(np.maximum(rng.randn(B, H, W, 128), 0), dt)
    corr = jnp.asarray(rng.randn(B, H, W, 81), dt)
    flow = jnp.asarray(rng.randn(B, H, W, 2) * 3, dt)
    x = jnp.asarray(rng.randn(B, H, W, 256), dt)  # [inp | motion+flow]

    def w(*shape, s=0.1):
        return jnp.asarray(rng.randn(*shape) * s, jnp.float32)

    res = {}
    set_flags({})

    # motion encoder x6 (chained through corr)
    mw = dict(wc1=w(1, 1, 81, 256), wc2=w(3, 3, 256, 192), wf1=w(7, 7, 2, 128),
              wf2=w(3, 3, 128, 64), wm=w(3, 3, 256, 126),
              biases=(w(256), w(128), w(192), w(64), w(126)))

    def motion6(c0, f0):
        c = c0
        out = None
        for _ in range(6):
            out = motion_encoder_fused(c, f0, **mw)
            c = c0 + out[..., :81] * jnp.asarray(1e-6, dt)
        return out

    res["motion_x6_ms"] = _t(motion6, corr, flow)

    # gru passes x6 (chained through h)
    kxh = w(1, 5, 256, 384)
    khzrh = w(1, 5, 128, 256)
    kqhh = w(1, 5, 128, 128)
    bz = w(3, 128)

    def gruh6(h0, xx):
        h = h0
        for _ in range(6):
            h = gru_pass(h, xx, kxh, khzrh, kqhh, bz, horizontal=True)
        return h

    res["gru_h_x6_ms"] = _t(gruh6, net, x)

    kxv = w(5, 1, 256, 384)
    khzrv = w(5, 1, 128, 256)
    kqhv = w(5, 1, 128, 128)

    def gruv6(h0, xx):
        h = h0
        for _ in range(6):
            h = gru_pass(h, xx, kxv, khzrv, kqhv, bz, horizontal=False)
        return h

    res["gru_v_x6_ms"] = _t(gruv6, net, x)

    # flow head x6 (XLA default form, chained through a net perturbation)
    hk1, hb1 = w(3, 3, 128, 256).astype(dt), w(256).astype(dt)
    hk2, hb2 = w(3, 3, 256, 2).astype(dt), w(2).astype(dt)

    def head6(n0):
        n = n0
        d = None
        for _ in range(6):
            y = jax.nn.relu(conv_via_matmul(n, hk1, (1, 1), (1, 1)) + hb1)
            d = conv_via_matmul(y, hk2, (1, 1), (1, 1)) + hb2
            n = n0 + d[..., :1] * jnp.asarray(1e-6, dt)
        return d

    res["head_x6_ms"] = _t(head6, net)

    # full update block x6 for the glue delta
    from unimatch_tpu.models.reg_refine import BasicUpdateBlock

    blk = BasicUpdateBlock(downsample_factor=8, flow_dim=2)
    params = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    params = jax.tree.map(lambda a: a.astype(dt), params)

    def block6(p, n0, i0, c0, f0):
        n, f = n0, f0
        for _ in range(6):
            n, _, d = blk.apply(p, n, i0, c0, f, with_mask=False)
            f = f + d
        return n, f

    res["block_x6_ms"] = _t(block6, params, net, inp, corr, flow)

    # --- hardware reference probes ---
    # MXU: the gru x-side conv as one im2col dot (K=1280) and as 5 tap dots
    a1 = jnp.asarray(rng.randn(28672, 1280), dt)
    w1 = jnp.asarray(rng.randn(1280, 384), dt)

    def dot_im2col(a, ww):
        return jax.lax.dot_general(a, ww, (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    res["dot_28672x1280x384_ms"] = _t(dot_im2col, a1, w1)

    a2 = jnp.asarray(rng.randn(28672, 256), dt)
    w2 = jnp.asarray(rng.randn(5, 256, 384), dt)

    def dot_taps(a, ww):
        acc = None
        for k in range(5):
            p = jax.lax.dot_general(a, ww[k], (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = p if acc is None else acc + p
        return acc

    res["dot_5tap_256x384_ms"] = _t(dot_taps, a2, w2)

    # HBM stream: elementwise over a volume-sized array (read + write)
    big = jnp.asarray(rng.randn(28672, 30720), dt)  # 1.76 GB

    def stream(v):
        return v * jnp.asarray(1.0001, dt)

    ms = _t(stream, big, n=6)
    res["stream_1p76GB_ms"] = ms
    res["stream_GBps"] = round(2 * big.size * 2 / ms / 1e6, 1)

    # HBM gather at the lookup's row widths: 4x512B vs 2x1KB vs 1x2KB rows
    n_px = 28672
    vol512 = jnp.asarray(rng.randn(n_px * 120, 256), dt)
    idx4 = jnp.asarray(rng.randint(0, n_px * 120, size=4 * n_px), jnp.int32)
    vol1k = jnp.asarray(rng.randn(n_px * 60, 512), dt)
    idx2 = jnp.asarray(rng.randint(0, n_px * 60, size=2 * n_px), jnp.int32)
    vol2k = jnp.asarray(rng.randn(n_px * 30, 1024), dt)
    idx1 = jnp.asarray(rng.randint(0, n_px * 30, size=n_px), jnp.int32)

    def gather(v, i):
        return jnp.take(v, i, axis=0)

    res["gather_4x512B_ms"] = _t(gather, vol512, idx4)
    res["gather_2x1KB_ms"] = _t(gather, vol1k, idx2)
    res["gather_1x2KB_ms"] = _t(gather, vol2k, idx1)
    # coherent variant: indices sorted (adjacent pixels hit nearby rows)
    idx4s = jnp.sort(idx4)
    res["gather_4x512B_sorted_ms"] = _t(gather, vol512, idx4s)

    emit(part="update_pieces", **res)


# ---------------------------------------------------------------------------


def stage_backbone_pieces():
    """Where do the backbone's 10 ms go? Stage-grained timings at the
    flagship bench shape (both images batch-concat: B=2)."""
    from unimatch_tpu.models.backbone import ResidualBlock, TridentConv
    from unimatch_tpu.models.layers import conv2d, instance_norm, conv_via_matmul

    rng = np.random.RandomState(3)
    dt = jnp.bfloat16
    set_flags({})
    res = {}

    def timed_module(tag, mod, x, n=12):
        params = mod.init(jax.random.PRNGKey(0), x)
        params = jax.tree.map(lambda a: a.astype(dt), params)
        res[tag] = _t(lambda p, v: mod.apply(p, v), params, x, n=n)

    img = jnp.asarray(rng.randn(2, 448, 1024, 3), dt)
    timed_module("stem_ms", conv2d(64, 7, stride=2, padding=3, use_bias=False,
                                   norm="instance", act="relu"), img)

    x1 = jnp.asarray(rng.randn(2, 224, 512, 64), dt)
    timed_module("rb64_ms", ResidualBlock(64), x1)
    timed_module("rb96_s2_ms", ResidualBlock(96, stride=2), x1)
    x2 = jnp.asarray(rng.randn(2, 112, 256, 96), dt)
    timed_module("rb96_ms", ResidualBlock(96), x2)
    timed_module("rb128_ms", ResidualBlock(128), x2)  # layer3_0 (stride 1)
    x3 = jnp.asarray(rng.randn(2, 112, 256, 128), dt)
    timed_module("rb128b_ms", ResidualBlock(128), x3)
    timed_module("trident_ms", TridentConv(128, (1, 2)), x3)

    # bare pieces at the stage-1 shape
    res["in64_ms"] = _t(instance_norm, x1)
    k64 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, dt)

    def conv_raw(v, k):
        return conv_via_matmul(v, k, (1, 1), (1, 1))

    res["conv64_ms"] = _t(conv_raw, x1, k64)
    k128 = jnp.asarray(rng.randn(3, 3, 128, 128) * 0.1, dt)
    res["conv128_ms"] = _t(conv_raw, x3, k128)
    emit(part="backbone_pieces", **res)


def stage_bb2_ab():
    """Fused conv+IN residual block (kernels/conv_in_fused.py) on chip:
    parity vs the XLA math, isolated block timings, and an encoder-level
    A/B (the backbone is ~10 ms of the flagship's 56; VERDICT tasks #2/#3)."""
    from unimatch_tpu.kernels.conv_in_fused import (
        residual_block_fused, conv_in_relu_fused, _reference_block,
        _reference_cir,
    )
    from unimatch_tpu.models.backbone import CNNEncoder

    rng = np.random.RandomState(13)
    dt = jnp.bfloat16
    res = {}
    set_flags({})

    # on-chip parity at a real stage-1 shape (f32 ref on the same values)
    x1 = jnp.asarray(rng.randn(2, 224, 512, 64) * 0.5, dt)
    k1 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.float32)
    k2 = jnp.asarray(rng.randn(3, 3, 64, 64) * 0.1, jnp.float32)
    got = jax.jit(residual_block_fused)(x1, k1, k2)
    want = jax.jit(_reference_block)(x1, k1, k2)
    res["rb64_parity_max_abs"] = float(
        jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)).max())
    res["rb64_fused_ms"] = _t(residual_block_fused, x1, k1, k2)
    res["rb64_xla_ms"] = _t(_reference_block, x1, k1, k2)

    xc = jnp.asarray(rng.randn(2, 112, 256, 96) * 0.5, dt)
    kc = jnp.asarray(rng.randn(3, 3, 96, 96) * 0.1, jnp.float32)
    gc_ = jax.jit(conv_in_relu_fused)(xc, kc)
    wc_ = jax.jit(_reference_cir)(xc, kc)
    res["cir96_parity_max_abs"] = float(
        jnp.abs(gc_.astype(jnp.float32) - wc_.astype(jnp.float32)).max())
    res["cir96_fused_ms"] = _t(conv_in_relu_fused, xc, kc)
    res["cir96_xla_ms"] = _t(_reference_cir, xc, kc)

    # encoder-level A/B at the flagship backbone shape (both images, B=2)
    img = jnp.asarray(rng.randn(2, 448, 1024, 3), dt)
    enc = CNNEncoder(output_dim=128, num_output_scales=2)
    with jax.default_device(jax.devices("cpu")[0]):
        imgc = jnp.asarray(np.asarray(img, np.float32), dt)
        params = enc.init(jax.random.PRNGKey(0), imgc)
    params = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                          params)
    params = jax.device_put(params, jax.devices()[0])

    def efwd(p, v):
        return enc.apply(p, v)[-1]

    outs = {}
    try:
        for rep in range(2):
            for name, ov in (("off", {}), ("on", {"UNIMATCH_FUSE_BB2": "1"})):
                set_flags(ov)
                res.setdefault(f"enc_{name}_ms", []).append(
                    _t(efwd, params, img, rep0=rep == 0))
                if rep == 0:
                    outs[name] = jax.jit(efwd)(params, img)
    finally:
        set_flags({})
    if len(outs) == 2:
        a, b = outs["off"], outs["on"]
        res["enc_parity_max_abs"] = float(
            jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    emit(part="bb2_ab", **res)


# ---------------------------------------------------------------------------


def stage_volume_ab():
    """Volume build: grid order / p-block / XLA einsum variants."""
    from unimatch_tpu.ops.correlation import build_tiled_correlation_volume

    rng = np.random.RandomState(5)
    dt = jnp.bfloat16
    f0 = jnp.asarray(rng.randn(1, 112, 256, 128), dt)
    f1 = jnp.asarray(rng.randn(1, 112, 256, 128), dt)

    def build(a, b):
        return build_tiled_correlation_volume(a, b, 4).vt

    arms = {
        "mp512": {},
        "pm512": {"UNIMATCH_VOLUME_GRID": "pm"},
        "pm1024": {"UNIMATCH_VOLUME_GRID": "pm", "UNIMATCH_VOLUME_BP": "1024"},
        "mp1024": {"UNIMATCH_VOLUME_BP": "1024"},
        "pm2048": {"UNIMATCH_VOLUME_GRID": "pm", "UNIMATCH_VOLUME_BP": "2048"},
        "xla": {"UNIMATCH_VOLUME_BUILD": "xla"},
    }
    res, outs = {}, {}
    try:
        for rep in range(2):
            for name, ov in arms.items():
                try:
                    set_flags(ov)
                    res.setdefault(name + "_ms", []).append(
                        _t(build, f0, f1, n=8, rep0=rep == 0))
                    if rep == 0 and name in ("mp512", "pm1024"):
                        outs[name] = jax.jit(build)(f0, f1)
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    res[name + "_err"] = repr(e)[:200]
    finally:
        set_flags({})
    if len(outs) == 2:
        a, b = outs.values()
        res["parity"] = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    emit(part="volume_ab", **res)


def stage_gru_t_ab():
    from unimatch_tpu.kernels.gru_fused import gru_pass

    rng = np.random.RandomState(9)
    dt = jnp.bfloat16
    net = jnp.asarray(rng.randn(1, 112, 256, 128) * 0.5, dt)
    x = jnp.asarray(rng.randn(1, 112, 256, 256), dt)
    kxv = jnp.asarray(rng.randn(5, 1, 256, 384) * 0.1, jnp.float32)
    khzrv = jnp.asarray(rng.randn(5, 1, 128, 256) * 0.1, jnp.float32)
    kqhv = jnp.asarray(rng.randn(5, 1, 128, 128) * 0.1, jnp.float32)
    bz = jnp.asarray(rng.randn(3, 128) * 0.1, jnp.float32)

    def gruv6(h0, xx):
        h = h0
        for _ in range(6):
            h = gru_pass(h, xx, kxv, khzrv, kqhv, bz, horizontal=False)
        return h

    res = {}
    try:
        for rep in range(2):
            for t in ("0", "16", "32"):
                try:
                    set_flags({"UNIMATCH_GRU_T": t})
                    res.setdefault(f"T{t}_ms", []).append(
                        _t(gruv6, net, x, rep0=rep == 0))
                except Exception as e:  # noqa: BLE001
                    res[f"T{t}_err"] = repr(e)[:200]
    finally:
        set_flags({})
    emit(part="gru_t_ab", **res)


# ---------------------------------------------------------------------------


def stage_prop_ups_compile():
    """Final tiny-shape compile attempt for the two HTTP-500 kernels."""
    set_flags({})
    rng = np.random.RandomState(11)
    dt = jnp.bfloat16
    try:
        from unimatch_tpu.kernels.local_corr import local_window_propagation

        feat = jnp.asarray(rng.randn(1, 16, 32, 128), dt)
        fl = jnp.asarray(rng.randn(1, 16, 32, 2), dt)
        out = local_window_propagation(feat, feat, fl, 1)
        jax.block_until_ready(out)
        emit(part="prop_compile_tiny", ok=True)
    except Exception as e:  # noqa: BLE001
        emit(part="prop_compile_tiny", ok=False, error=repr(e)[:300])
    try:
        from unimatch_tpu.kernels.upsample_fused import upsample_with_mask_fused

        fl = jnp.asarray(rng.randn(1, 16, 32, 2), dt)
        mask = jnp.asarray(rng.randn(1, 16, 32, 144), dt)
        out = upsample_with_mask_fused(fl, mask, 4, False)
        jax.block_until_ready(out)
        emit(part="ups_compile_tiny", ok=True)
    except Exception as e:  # noqa: BLE001
        emit(part="ups_compile_tiny", ok=False, error=repr(e)[:300])


def stage_profile_trace():
    """Profiler + HLO dump attempts on the cached flagship forward."""
    set_flags({})
    fwd, params, a, b = _variant_fwd("GMFLOW_SCALE2_REGREFINE6", (448, 1024))
    jfwd = jax.jit(fwd)
    out = jfwd(params, a, b)
    jax.block_until_ready(out)
    # optimized-HLO dump (fusion boundaries + buffer sizes, offline analysis)
    try:
        txt = jfwd.lower(params, a, b).compile().as_text()
        with open("/tmp/flagship_hlo.txt", "w") as f:
            f.write(txt)
        emit(part="hlo_dump", ok=True, bytes=len(txt))
    except Exception as e:  # noqa: BLE001
        emit(part="hlo_dump", ok=False, error=repr(e)[:300])
    try:
        import glob

        with jax.profiler.trace("/tmp/prof_r5a"):
            o = None
            for _ in range(3):
                o = jfwd(params, a, b)
            jax.block_until_ready(o)
        files = [
            (p, os.path.getsize(p))
            for p in glob.glob("/tmp/prof_r5a/**/*", recursive=True)
            if os.path.isfile(p)
        ]
        emit(part="profile_trace", ok=True, files=files[:10])
    except Exception as e:  # noqa: BLE001
        emit(part="profile_trace", ok=False, error=repr(e)[:300])


if __name__ == "__main__":
    emit(part="session_r5a", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or [
        "compile_gate", "update_pieces", "backbone_pieces", "bb2_ab",
        "volume_ab", "gru_t_ab", "prop_ups_compile", "profile_trace",
    ]
    fns = {
        "compile_gate": stage_compile_gate,
        "update_pieces": stage_update_pieces,
        "backbone_pieces": stage_backbone_pieces,
        "bb2_ab": stage_bb2_ab,
        "volume_ab": stage_volume_ab,
        "gru_t_ab": stage_gru_t_ab,
        "prop_ups_compile": stage_prop_ups_compile,
        "profile_trace": stage_profile_trace,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r5a", status="complete", end=time.strftime("%H:%M:%S"))
