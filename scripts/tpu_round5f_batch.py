"""Round-5 batch F: in-situ A/B of the round-5e layout/gather levers.

  flagship_ab   448x1024 arms: default | s2d (S2D_SLICE) | lax (STEM_LAX +
                BB_LAX) | s2d+bb (S2D_SLICE + BB_LAX). The two stem
                treatments (slice-form s2d vs lax.conv stem) are exclusive
                alternatives; BB_LAX rides on both.
  scale1_ab     GMFlow-scale1 448x1024: default | best flagship arm.
  depth_ab      GMDepth-scale1 480x640: default | best | best+pair
                (UNIMATCH_DEPTH_WARP_DOT=pair) | pair alone.
  stereo_ab     GMStereo-scale2-regrefine3 384x1248: default | best.

Every arm re-traces through time_chained's fresh closure (env flags are
read at trace time); outputs for parity come from per-arm fresh jits
(CLAUDE.md trace-identity lesson). Appends to /tmp/tpu_r5f_results.jsonl.
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

OUT = "/tmp/tpu_r5f_results.jsonl"
TOUCHED = (
    "UNIMATCH_S2D_SLICE", "UNIMATCH_BB_LAX", "UNIMATCH_STEM_LAX",
    "UNIMATCH_DEPTH_WARP_DOT",
)

ARMS = {
    "default": {},
    "s2d": {"UNIMATCH_S2D_SLICE": "1"},
    "lax": {"UNIMATCH_STEM_LAX": "1", "UNIMATCH_BB_LAX": "1"},
    "s2d_bb": {"UNIMATCH_S2D_SLICE": "1", "UNIMATCH_BB_LAX": "1"},
}

BEST = {}  # filled by flagship_ab; consumed by the other stages


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


def _best_arm(res, arms):
    best, best_ms = "default", min(res.get("default_ms", [9e9])[1:] or [9e9])
    for name in arms:
        if name == "default" or f"{name}_ms" not in res:
            continue
        ms = min(res[f"{name}_ms"][1:] or res[f"{name}_ms"])
        if ms < best_ms:
            best, best_ms = name, ms
    return best


def stage_flagship_ab():
    res = _run_arms("flagship_ab", "GMFLOW_SCALE2_REGREFINE6", (448, 1024), ARMS)
    BEST["arm"] = _best_arm(res, ARMS)
    BEST["flags"] = dict(ARMS[BEST["arm"]])
    emit(part="flagship_best", arm=BEST["arm"], flags=BEST["flags"])


def stage_scale1_ab():
    arms = {"default": {}, "best": BEST.get("flags", ARMS["s2d_bb"])}
    _run_arms("scale1_ab", "GMFLOW_SCALE1", (448, 1024), arms, n=24)


def stage_depth_ab():
    bf = BEST.get("flags", ARMS["s2d_bb"])
    arms = {
        "default": {},
        "best": dict(bf),
        "best_pair": {**bf, "UNIMATCH_DEPTH_WARP_DOT": "pair"},
        "pair": {"UNIMATCH_DEPTH_WARP_DOT": "pair"},
    }
    _run_arms("depth_ab", "GMDEPTH_SCALE1", (480, 640), arms, n=40)


def stage_stereo_ab():
    arms = {"default": {}, "best": BEST.get("flags", ARMS["s2d_bb"])}
    _run_arms("stereo_ab", "GMSTEREO_SCALE2_REGREFINE3", (384, 1248), arms)


if __name__ == "__main__":
    emit(part="session_r5f", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or ["flagship_ab", "scale1_ab", "depth_ab", "stereo_ab"]
    fns = {
        "flagship_ab": stage_flagship_ab,
        "scale1_ab": stage_scale1_ab,
        "depth_ab": stage_depth_ab,
        "stereo_ab": stage_stereo_ab,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r5f", status="complete", end=time.strftime("%H:%M:%S"))
