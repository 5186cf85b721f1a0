"""On-TPU parity + A/B for the fused SepConvGRU kernel (kernels/gru_fused.py)
and a fused-FFN re-measure with the hardened methodology.

Stages (each guarded so one Mosaic failure doesn't kill the batch):
  1. gru_parity   — kernel vs XLA SepConvGRU on-chip, bf16 flagship shape
  2. gru_ab       — BasicUpdateBlock x1/x6, FUSE_GRU=1 vs 0 interleaved
  3. forward_ab   — full flagship forward, FUSE_GRU=1 vs 0 interleaved
  4. ffn_ab       — fused_ffn vs XLA FFN tail at the s1 shape (round-2's
                    "9x slower" predates the warmup/interleave methodology)

Emits JSON lines to stdout and /tmp/tpu_r3d_results.jsonl.
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

OUT = "/tmp/tpu_r3d_results.jsonl"


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


def _gru_setup():
    from unimatch_tpu.models.reg_refine import SepConvGRU

    gru = SepConvGRU()
    h = bf(1, 112, 256, 128)
    parts = [bf(1, 112, 256, 128), bf(1, 112, 256, 126), bf(1, 112, 256, 2)]
    params = gru.init(jax.random.PRNGKey(0), h, parts)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    return gru, params, h, parts


def stage_gru_parity():
    gru, params, h, parts = _gru_setup()
    os.environ["UNIMATCH_FUSE_GRU"] = "1"
    a = jax.jit(lambda: gru.apply(params, h, parts))()
    os.environ["UNIMATCH_FUSE_GRU"] = "0"
    b = jax.jit(lambda: gru.apply(params, h, parts))()
    d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    amax = float(jnp.abs(b.astype(jnp.float32)).max())
    emit(part="gru_parity", max_abs_diff=d, ref_absmax=amax)


def stage_gru_ab():
    from unimatch_tpu.models.reg_refine import BasicUpdateBlock

    blk = BasicUpdateBlock(downsample_factor=4, flow_dim=2, bilinear_up=False)
    net, inp = bf(1, 112, 256, 128), bf(1, 112, 256, 128)
    corr, flow = bf(1, 112, 256, 81), bf(1, 112, 256, 2)
    params = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

    def mk(tag):
        def fwd1(p, net, inp, corr, flow):
            return blk.apply(p, net, inp, corr, flow)

        def fwd6(p, net, inp, corr, flow):
            f, mask = flow, None
            for _ in range(6):
                _, mask, delta = blk.apply(p, net, inp, corr, f)
                f = f + delta
            return f, mask.astype(jnp.float32).sum()

        fwd1.__name__ += tag
        fwd6.__name__ += tag
        return fwd1, fwd6

    f1a, f6a = mk("_fused")
    f1b, f6b = mk("_xla")
    res = {}
    for rep in range(2):
        os.environ["UNIMATCH_FUSE_GRU"] = "1"
        res.setdefault("fused_x1", []).append(round(time_chained(
            f1a, params, net, inp, corr, flow, n=20,
            min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        res.setdefault("fused_x6", []).append(round(time_chained(
            f6a, params, net, inp, corr, flow, n=10, warmup=2) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_GRU"] = "0"
        res.setdefault("xla_x1", []).append(round(time_chained(
            f1b, params, net, inp, corr, flow, n=20, warmup=2) * 1e3, 2))
        res.setdefault("xla_x6", []).append(round(time_chained(
            f6b, params, net, inp, corr, flow, n=10, warmup=2) * 1e3, 2))
    emit(part="gru_ab", **res)


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
        os.environ["UNIMATCH_FUSE_GRU"] = "1"
        res.setdefault("fused_ms", []).append(round(time_chained(
            fa, params, img0, img1, n=12,
            min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        os.environ["UNIMATCH_FUSE_GRU"] = "0"
        res.setdefault("xla_ms", []).append(round(time_chained(
            fb, params, img0, img1, n=12, warmup=1) * 1e3, 1))
    bestf = min(res["fused_ms"])
    bestx = min(res["xla_ms"])
    emit(part="forward_ab", **res,
         fused_best_pairs_per_sec=round(1000.0 / bestf, 2),
         xla_best_pairs_per_sec=round(1000.0 / bestx, 2))


def stage_ffn_ab():
    from unimatch_tpu.kernels.ffn import fused_ffn, _reference_ffn

    n, l, c, hdim = 2, 28672, 128, 1024
    src = bf(n, l, c)
    msg = bf(n, l, c)
    w0 = bf(2 * c, hdim, scale=0.05)
    w2 = bf(hdim, c, scale=0.05)
    gamma = jnp.ones((c,), jnp.bfloat16)
    beta = jnp.zeros((c,), jnp.bfloat16)

    def pfn(s, m):
        return fused_ffn(s, m, w0, w2, gamma, beta)

    def xfn(s, m):
        return _reference_ffn(s, m, w0, w2, gamma, beta)

    res = {}
    for rep in range(2):
        res.setdefault("pallas_ms", []).append(round(time_chained(
            pfn, src, msg, n=30, min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
        res.setdefault("xla_ms", []).append(round(time_chained(
            xfn, src, msg, n=30, warmup=2) * 1e3, 2))
    a = jax.jit(pfn)(src, msg)
    b = jax.jit(xfn)(src, msg)
    d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    emit(part="ffn_ab", **res, max_abs_diff=d)


if __name__ == "__main__":
    emit(part="session", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    guarded(stage_gru_parity)
    guarded(stage_gru_ab)
    guarded(stage_forward_ab)
    guarded(stage_ffn_ab)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
