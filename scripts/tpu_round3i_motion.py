"""On-TPU parity + A/B for the fused motion-encoder kernel, plus the
depth-model FFN A/B. Emits to /tmp/tpu_r3i_results.jsonl."""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = "/tmp/tpu_r3i_results.jsonl"


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

    def fa(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    def fb(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_FUSE_MOTION"] = "1"
        res.setdefault("motion_ms", []).append(round(time_chained(
            fa, params, img0, img1, n=12,
            min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_FUSE_MOTION"] = "0"
        res.setdefault("xla_ms", []).append(round(time_chained(
            fb, params, img0, img1, n=12, warmup=1) * 1e3, 1))
    emit(part="forward_motion_ab", **res,
         motion_best_pairs_per_sec=round(1000.0 / min(res["motion_ms"]), 2),
         xla_best_pairs_per_sec=round(1000.0 / min(res["xla_ms"]), 2))


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
    guarded(stage_motion_parity)
    guarded(stage_update_ab)
    guarded(stage_forward_ab)
    guarded(stage_depth_ffn)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
