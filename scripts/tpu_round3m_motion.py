"""Lean follow-up to the 3j batch (fresh process, so the fixed
kernels/motion_fused.py is actually loaded — 3j's stage_forward_ab error
also leaked UNIMATCH_FUSE_MOTION=1 into the swin stage and killed its
flagship A/B; see /tmp/r3j_log.txt).

Measures: small-shape on-chip motion parity, then ONE interleaved flagship
A/B — all-default baseline vs motion+swin enabled together (2 flagship
compiles; the two levers touch disjoint model regions, so a combined
decision is acceptable at this wall-clock budget; isolated evidence:
swin won its transformer-level A/B 8.9 vs 10.7 ms in 3j).
Appends to /tmp/tpu_r3j_results.jsonl."""

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
PAIR = ("UNIMATCH_FUSE_MOTION", "UNIMATCH_SWIN_SPATIAL")


def bf(*shape, scale=1.0):
    return jnp.asarray(RNG.randn(*shape) * scale, jnp.bfloat16)


def stage_motion_parity_small():
    from unimatch_tpu.models.reg_refine import BasicMotionEncoder

    enc = BasicMotionEncoder(flow_channels=2)
    flow = bf(1, 48, 64, 2, scale=3.0)
    corr = bf(1, 48, 64, 81)
    try:
        os.environ["UNIMATCH_FUSE_MOTION"] = "0"
        params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                              enc.init(jax.random.PRNGKey(0), flow, corr))
        b = jax.jit(lambda: enc.apply(params, flow, corr)[0])()
        os.environ["UNIMATCH_FUSE_MOTION"] = "1"
        a = jax.jit(lambda: enc.apply(params, flow, corr)[0])()
    finally:
        os.environ["UNIMATCH_FUSE_MOTION"] = "0"
    emit(part="motion_parity_small",
         max_abs_diff=float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(b.astype(jnp.float32)).max()))


def stage_forward_pair_ab():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    for k in PAIR:
        os.environ[k] = "0"
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mkf(tag):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ += tag
        return fwd

    fa, fb = mkf("_motion_swin"), mkf("_default")
    res = {}
    try:
        for rep in range(3):
            for k in PAIR:
                os.environ[k] = "1"
            res.setdefault("motion_swin_ms", []).append(round(time_chained(
                fa, params, img0, img1, n=12,
                min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
            for k in PAIR:
                os.environ[k] = "0"
            res.setdefault("default_ms", []).append(round(time_chained(
                fb, params, img0, img1, n=12, warmup=1) * 1e3, 1))
    finally:
        for k in PAIR:
            os.environ[k] = "0"
    emit(part="forward_pair_ab", **res,
         motion_swin_best_pairs_per_sec=round(1000.0 / min(res["motion_swin_ms"]), 2),
         default_best_pairs_per_sec=round(1000.0 / min(res["default_ms"]), 2))


if __name__ == "__main__":
    emit(part="session_3m", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    guarded(stage_motion_parity_small)
    guarded(stage_forward_pair_ab)
    emit(part="session_3m", status="complete", end=time.strftime("%H:%M:%S"))
