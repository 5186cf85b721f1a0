"""Round-5 batch D: post-combo defaults — prop/upsample debut + variant profiles.

  flagship_prop_ups_ab  flagship 448x1024 in-situ arms at the NEW (combo)
                        defaults: default | +FUSE_LOCAL_PROP | +FUSE_UPSAMPLE
                        | +both. The two kernels compiled AND ran on chip at
                        flagship shapes for the first time in r5c (the
                        round-4 HTTP-500s are gone) — this is their in-situ
                        measurement (VERDICT r4 #5).
  depth_profile         GMDepth-scale1 480x640 profiler trace -> per-op
                        device-time table (the r5a flagship decode found the
                        5.6 ms relayout copy; depth at 1.45x needs the same
                        treatment before building its lever — VERDICT r4 #2)
  scale1_profile        GMFlow-scale1 448x1024 trace -> per-op table
                        (VERDICT r4 #3)

Appends JSON lines to /tmp/tpu_r5d_results.jsonl (commit to
docs/artifacts_round5_tpu.jsonl afterwards).
"""

import glob
import gzip
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

OUT = "/tmp/tpu_r5d_results.jsonl"
TOUCHED = (
    "UNIMATCH_VOLUME_UMAJOR", "UNIMATCH_MOTION_IM2COL", "UNIMATCH_GRU_VCOL",
    "UNIMATCH_GRU_T", "UNIMATCH_FUSE_LOCAL_PROP", "UNIMATCH_FUSE_UPSAMPLE",
)

ARMS = {
    "default": {},
    "prop": {"UNIMATCH_FUSE_LOCAL_PROP": "1"},
    "ups": {"UNIMATCH_FUSE_UPSAMPLE": "1"},
    "both": {"UNIMATCH_FUSE_LOCAL_PROP": "1", "UNIMATCH_FUSE_UPSAMPLE": "1"},
}


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


def stage_flagship_prop_ups_ab():
    fwd, params, a, b = _variant_fwd("GMFLOW_SCALE2_REGREFINE6", (448, 1024))
    res, outs = {}, {}
    try:
        for rep in range(3):
            for name in ("default", "prop", "ups", "both"):
                try:
                    set_flags(ARMS[name])
                    res.setdefault(f"{name}_ms", []).append(
                        _t(fwd, params, a, b, rep0=rep == 0))
                    if rep == 0:
                        # fresh closure per arm (trace-identity cache, CLAUDE.md)
                        outs[name] = jax.jit(lambda p, x, y: fwd(p, x, y))(params, a, b)
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    res[f"{name}_err"] = repr(e)[:300]
    finally:
        set_flags({})
    ref = outs.get("default")
    if ref is not None:
        rf = np.asarray(ref, np.float32)
        res["absmax"] = float(np.abs(rf).max())
        for name, o in outs.items():
            if name != "default":
                res[f"{name}_parity"] = float(
                    np.abs(np.asarray(o, np.float32) - rf).max())
    emit(part="flagship_prop_ups_ab", **res)


def _profile_variant(cfg_name, shape, tag, iters=4):
    """Trace `iters` cached forwards; decode the Chrome trace into a per-op
    device-time table (total ms across iters, top 35 by time)."""
    set_flags({})
    fwd, params, a, b = _variant_fwd(cfg_name, shape)
    jfwd = jax.jit(fwd)
    jax.block_until_ready(jfwd(params, a, b))
    logdir = f"/tmp/prof_{tag}"
    with jax.profiler.trace(logdir):
        o = None
        for _ in range(iters):
            o = jfwd(params, a, b)
        jax.block_until_ready(o)
    traces = sorted(glob.glob(f"{logdir}/**/*.trace.json.gz", recursive=True),
                    key=os.path.getmtime)
    if not traces:
        emit(part=tag, ok=False, error="no trace.json.gz produced")
        return
    with gzip.open(traces[-1], "rt") as f:
        data = json.load(f)
    agg = {}
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X" or "name" not in ev:
            continue
        agg[ev["name"]] = agg.get(ev["name"], 0.0) + ev.get("dur", 0) / 1e3
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:35]
    emit(part=tag, ok=True, iters=iters,
         top_ops=[[n, round(ms, 2)] for n, ms in top])


def stage_depth_profile():
    _profile_variant("GMDEPTH_SCALE1", (480, 640), "depth_profile")


def stage_scale1_profile():
    _profile_variant("GMFLOW_SCALE1", (448, 1024), "scale1_profile")


if __name__ == "__main__":
    emit(part="session_r5d", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or [
        "flagship_prop_ups_ab", "depth_profile", "scale1_profile",
    ]
    fns = {
        "flagship_prop_ups_ab": stage_flagship_prop_ups_ab,
        "depth_profile": stage_depth_profile,
        "scale1_profile": stage_scale1_profile,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r5d", status="complete", end=time.strftime("%H:%M:%S"))
