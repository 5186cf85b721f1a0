"""Round-5 batch J: y-paired int8 volume debut (UNIMATCH_VOLUME_PAIR).

The r5i profile showed the refine lookup's 4-row unit gather is
TRANSACTION-limited (int8 halved its bytes and moved it 27.97 -> 27.89 ms,
i.e. nothing). The paired volume halves the ROW COUNT instead: each stored
unit is a vertical tile pair [top|bottom] (512 B int8 row), so a window
lookup gathers 2 rows per pixel instead of 4, at the cost of a 2x volume
build (~+1.3 ms) and a (nrc+1)/nrc memory factor. Expected net: -1 to
-2.5 ms flagship if the gather is purely per-row-cost-bound; ~0 if the
footprint coalescing already amortizes transactions (the depth paired-row
lever lost that way, r5f).

  flagship_ab   448x1024: default (int8, 4-row gather) | pair
  stereo_ab     384x1248: same arms (shares the tiled-volume dispatch)

Appends to /tmp/tpu_r5j_results.jsonl.
"""

import glob
import gzip
import json
import os
import re
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

OUT = "/tmp/tpu_r5j_results.jsonl"
TOUCHED = ("UNIMATCH_VOLUME_INT8", "UNIMATCH_VOLUME_PAIR")


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
    emit(part=tag, **res)
    return res


_DEF_RE_CACHE = {}


def _hlo_op_info(hlo_text, op_name):
    pat = _DEF_RE_CACHE.get(op_name)
    if pat is None:
        pat = re.compile(r"^\s*(?:ROOT\s+)?%?" + re.escape(op_name) + r"\s*=\s*(.*)$",
                         re.M)
        _DEF_RE_CACHE[op_name] = pat
    m = pat.search(hlo_text)
    if not m:
        return None
    line = m.group(1)
    shape = line.split(" ", 1)[0]
    src = ""
    sm = re.search(r'op_name="([^"]*)"', line)
    if sm:
        src = sm.group(1)
    fm = re.search(r'source_file="([^"]*)".*?source_line=(\d+)', line)
    if fm:
        src += f" @ {os.path.basename(fm.group(1))}:{fm.group(2)}"
    return {"shape": shape, "src": src[-220:], "snippet": line[:160]}


def _profile_variant_hlo(cfg_name, shape, tag, iters=4):
    set_flags({})
    fwd, params, a, b = _variant_fwd(cfg_name, shape)
    jfwd = jax.jit(fwd)
    jax.block_until_ready(jfwd(params, a, b))
    hlo_text = ""
    try:
        hlo_text = jfwd.lower(params, a, b).compile().as_text()
        with open(f"/tmp/hlo_{tag}.txt", "w") as f:
            f.write(hlo_text)
        emit(part=f"hlo_{tag}", ok=True, bytes=len(hlo_text))
    except Exception as e:  # noqa: BLE001
        emit(part=f"hlo_{tag}", ok=False, error=repr(e)[:300])

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
    top = sorted(agg.items(), key=lambda kv: -kv[1])[:45]
    rows = []
    for name, ms in top:
        row = {"op": name, "ms": round(ms, 2)}
        if hlo_text and re.match(r"^[\w.\-]+$", name):
            info = _hlo_op_info(hlo_text, name)
            if info:
                rows.append({**row, **info})
                continue
        rows.append(row)
    emit(part=tag, ok=True, iters=iters, top_ops=rows)


_AB_ARMS = {
    "default": {},
    "pair": {"UNIMATCH_VOLUME_PAIR": "1"},
}


def stage_flagship_ab():
    _run_arms("flagship_ab", "GMFLOW_SCALE2_REGREFINE6", (448, 1024), _AB_ARMS)


def stage_stereo_ab():
    _run_arms("stereo_ab", "GMSTEREO_SCALE2_REGREFINE3", (384, 1248), _AB_ARMS)


def stage_profile_flagship():
    _profile_variant_hlo("GMFLOW_SCALE2_REGREFINE6", (448, 1024), "flagship_r5j")


def stage_profile_depth():
    _profile_variant_hlo("GMDEPTH_SCALE1", (480, 640), "depth_r5j", iters=8)


def stage_confirm():
    _run_arms("depth_confirm", "GMDEPTH_SCALE1", (480, 640),
              {"default": {}}, n=40)
    _run_arms("scale1_confirm", "GMFLOW_SCALE1", (448, 1024),
              {"default": {}}, n=24)


def stage_scale2_confirm():
    # gmflow_scale2 (no refine loop) last measured in round 4g (41.8
    # pairs/s); the stem-lax default landed since. Run as a follow-up
    # invocation: python scripts/tpu_round5j_batch.py scale2_confirm
    _run_arms("scale2_confirm", "GMFLOW_SCALE2", (448, 1024),
              {"default": {}}, n=24)


if __name__ == "__main__":
    emit(part="session_r5j", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or ["flagship_ab", "stereo_ab"]
    fns = {
        "flagship_ab": stage_flagship_ab,
        "stereo_ab": stage_stereo_ab,
        "profile_flagship": stage_profile_flagship,
        "profile_depth": stage_profile_depth,
        "confirm": stage_confirm,
        "scale2_confirm": stage_scale2_confirm,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r5j", status="complete", end=time.strftime("%H:%M:%S"))
