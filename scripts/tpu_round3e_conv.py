"""On-TPU A/B for the banded fused conv kernel (kernels/conv_banded.py)
plus the combined-flags forward and a bench-shape read.

Stages (guarded):
  1. conv shapes   — banded_conv2d vs conv_via_matmul at the hot shapes
  2. backbone_ab   — FUSE_CONV=1 vs 0 (banded kernel in residual blocks)
  3. refine_ab     — update block x6, FUSE_CONV=1 vs 0 (FUSE_GRU=1 both)
  4. forward_ab    — full flagship forward, FUSE_CONV=1 vs 0

Emits JSON lines to stdout and /tmp/tpu_r3e_results.jsonl.
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

OUT = "/tmp/tpu_r3e_results.jsonl"


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


def stage_conv_shapes():
    from unimatch_tpu.kernels.conv_banded import banded_conv2d
    from unimatch_tpu.models.layers import conv_via_matmul

    shapes = [
        ("bb_3x3_64_64_s1", (2, 224, 512, 64), (3, 3), 64),
        ("bb_3x3_96_96", (2, 112, 256, 96), (3, 3), 96),
        ("convc2_3x3_256_192", (1, 112, 256, 256), (3, 3), 192),
        ("motion_3x3_256_126", (1, 112, 256, 256), (3, 3), 126),
        ("flowhead_3x3_128_256", (1, 112, 256, 128), (3, 3), 256),
    ]
    for name, xs, (kh, kw), cout in shapes:
        x = bf(*xs)
        k = bf(kh, kw, xs[-1], cout, scale=0.05)
        b = bf(cout)

        def pfn(x, k, b):
            return banded_conv2d(x, k, b, act="relu")

        def xfn(x, k, b, kh=kh, kw=kw):
            y = conv_via_matmul(x, k, (1, 1), ((kh - 1) // 2, (kw - 1) // 2))
            return jnp.maximum(y + b, 0)

        dt_p = time_chained(pfn, x, k, b, n=30, min_warmup_s=3)
        dt_x = time_chained(xfn, x, k, b, n=30, warmup=2)
        dt_p2 = time_chained(pfn, x, k, b, n=30, warmup=2)
        a = jax.jit(pfn)(x, k, b)
        c = jax.jit(xfn)(x, k, b)
        d = float(jnp.abs(a.astype(jnp.float32) - c.astype(jnp.float32)).max())
        emit(part=f"bconv_{name}", pallas_ms=[round(dt_p * 1e3, 2), round(dt_p2 * 1e3, 2)],
             xla_ms=round(dt_x * 1e3, 2), max_abs_diff=d)


def stage_backbone_ab():
    from unimatch_tpu.models.backbone import CNNEncoder

    enc = CNNEncoder(output_dim=128, num_output_scales=2)
    x = bf(2, 448, 1024, 3, scale=50.0)
    params = enc.init(jax.random.PRNGKey(0), x)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def fwd_fused(p, x):
        return enc.apply(p, x)

    def fwd_xla(p, x):
        return enc.apply(p, x)

    res = {"fused": [], "xla": []}
    for rep in range(3):
        os.environ["UNIMATCH_FUSE_CONV"] = "1"
        res["fused"].append(round(time_chained(fwd_fused, params, x, n=20,
                                               min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_CONV"] = "0"
        res["xla"].append(round(time_chained(fwd_xla, params, x, n=20,
                                             min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
    os.environ["UNIMATCH_FUSE_CONV"] = "0"
    emit(part="backbone_ab", **res)


def stage_refine_ab():
    from unimatch_tpu.models.reg_refine import BasicUpdateBlock

    blk = BasicUpdateBlock(downsample_factor=4, flow_dim=2, bilinear_up=False)
    net, inp = bf(1, 112, 256, 128), bf(1, 112, 256, 128)
    corr, flow = bf(1, 112, 256, 81), bf(1, 112, 256, 2)
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

    f6a, f6b = mk("_bconv"), mk("_xla")
    os.environ["UNIMATCH_FUSE_GRU"] = "1"
    res = {}
    for rep in range(2):
        os.environ["UNIMATCH_FUSE_CONV"] = "1"
        res.setdefault("bconv_x6", []).append(round(time_chained(
            f6a, params, net, inp, corr, flow, n=10,
            min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_CONV"] = "0"
        res.setdefault("xla_x6", []).append(round(time_chained(
            f6b, params, net, inp, corr, flow, n=10, warmup=2) * 1e3, 2))
    os.environ["UNIMATCH_FUSE_CONV"] = "0"
    emit(part="refine_conv_ab", **res)


def stage_forward_ab():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray((np.random.RandomState(1).rand(1, 448, 1024, 3) * 255), jnp.bfloat16)
    img1 = jnp.asarray((np.random.RandomState(2).rand(1, 448, 1024, 3) * 255), jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def fa(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    def fb(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_FUSE_CONV"] = "1"
        res.setdefault("bconv_ms", []).append(round(time_chained(
            fa, params, img0, img1, n=12,
            min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_FUSE_CONV"] = "0"
        res.setdefault("xla_ms", []).append(round(time_chained(
            fb, params, img0, img1, n=12, warmup=1) * 1e3, 1))
    os.environ["UNIMATCH_FUSE_CONV"] = "0"
    bestf = min(res["bconv_ms"])
    bestx = min(res["xla_ms"])
    emit(part="forward_conv_ab", **res,
         bconv_best_pairs_per_sec=round(1000.0 / bestf, 2),
         xla_best_pairs_per_sec=round(1000.0 / bestx, 2))


if __name__ == "__main__":
    emit(part="session", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    guarded(stage_conv_shapes)
    guarded(stage_backbone_ab)
    guarded(stage_refine_ab)
    guarded(stage_forward_ab)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
