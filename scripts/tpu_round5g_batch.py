"""Round-5 batch G: int8 volume debut + stem-lax decomposition + new baselines.

  flagship_ab  448x1024: default (now incl. the scan-ys fix committed after
               r5f launched) | int8 (UNIMATCH_VOLUME_INT8) | stem
               (UNIMATCH_STEM_LAX alone — r5f's lax arm bundled BB_LAX and
               tied; this decomposes) | int8_stem.
  depth_ab     GMDepth-scale1 480x640: default | stem (the 1.09 ms stem
               relayout is depth's largest single fixable item).
  scale1_ab    GMFlow-scale1 448x1024: default | stem (at 1.99x, one small
               win crosses the 2x bar).
  stereo_ab    384x1248: default | best-of-flagship.

Appends to /tmp/tpu_r5g_results.jsonl.
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

OUT = "/tmp/tpu_r5g_results.jsonl"
TOUCHED = ("UNIMATCH_VOLUME_INT8", "UNIMATCH_STEM_LAX", "UNIMATCH_BB_LAX")

BEST = {"flags": {}}


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


def guarded(fn, *args):
    t0 = time.time()
    try:
        fn(*args)
        emit(part="stage_" + fn.__name__.removeprefix("stage_"), status="done",
             wall_s=round(time.time() - t0, 1))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        emit(part="stage_" + fn.__name__.removeprefix("stage_"), status="error",
             error=repr(e)[:400])


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


def _run_arms(tag, cfg_name, shape, arms, reps=3, n=12):
    fwd, params, a, b = _variant_fwd(cfg_name, shape)
    res, outs = {}, {}
    try:
        for rep in range(reps):
            for name, flags in arms.items():
                try:
                    set_flags(flags)
                    res.setdefault(f"{name}_ms", []).append(
                        _t(fwd, params, a, b, rep0=rep == 0, n=n))
                    if rep == 0:
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
    emit(part=tag, **res)
    return res


def stage_flagship_ab():
    arms = {
        "default": {},
        "int8": {"UNIMATCH_VOLUME_INT8": "1"},
        "stem": {"UNIMATCH_STEM_LAX": "1"},
        "int8_stem": {"UNIMATCH_VOLUME_INT8": "1", "UNIMATCH_STEM_LAX": "1"},
    }
    res = _run_arms("flagship_ab", "GMFLOW_SCALE2_REGREFINE6", (448, 1024), arms)
    best, best_ms = "default", min(res.get("default_ms", [9e9])[1:] or [9e9])
    for name in arms:
        ms_l = res.get(f"{name}_ms")
        if name == "default" or not ms_l:
            continue
        ms = min(ms_l[1:] or ms_l)
        if ms < best_ms:
            best, best_ms = name, ms
    BEST["flags"] = dict(arms[best])
    emit(part="flagship_best", arm=best, flags=BEST["flags"])


def stage_depth_ab():
    arms = {"default": {}, "stem": {"UNIMATCH_STEM_LAX": "1"}}
    _run_arms("depth_ab", "GMDEPTH_SCALE1", (480, 640), arms, n=40)


def stage_scale1_ab():
    arms = {"default": {}, "stem": {"UNIMATCH_STEM_LAX": "1"}}
    _run_arms("scale1_ab", "GMFLOW_SCALE1", (448, 1024), arms, n=24)


def stage_stereo_ab():
    arms = {"default": {}, "best": BEST.get("flags", {})}
    _run_arms("stereo_ab", "GMSTEREO_SCALE2_REGREFINE3", (384, 1248), arms)


if __name__ == "__main__":
    emit(part="session_r5g", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or ["flagship_ab", "depth_ab", "scale1_ab", "stereo_ab"]
    fns = {
        "flagship_ab": stage_flagship_ab,
        "depth_ab": stage_depth_ab,
        "scale1_ab": stage_scale1_ab,
        "stereo_ab": stage_stereo_ab,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r5g", status="complete", end=time.strftime("%H:%M:%S"))
