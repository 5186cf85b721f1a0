"""Round-4 batch I: retry the two levers blocked by relay HTTP 500s.

The streaming local-window propagation (kernels/local_corr.py:
local_window_propagation) and the fused convex upsample
(kernels/upsample_fused.py) both failed their round-4e Mosaic compiles with
"HTTP 500: tpu_compile_helper subprocess exit code 1" and NO Mosaic
diagnostic — the same failure signature the fused update kernel showed once
(round-4g try 1) before compiling cleanly on retry, so the 500s look like
relay-side crashes, not kernel rejections. Stages:

  prop_kernel       isolated compile + parity + A/B at flagship s1
                    (112x256, c=128, radius 1)
  upsample_kernel   isolated compile + parity + A/B at flagship shape
                    (112x256, flow 2ch, factor 4, mask 144ch)
  flagship_ab       in-situ arms: default / prop / ups / both

Appends JSON lines to /tmp/tpu_r4i_results.jsonl.
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

OUT = "/tmp/tpu_r4i_results.jsonl"
TOUCHED = ("UNIMATCH_FUSE_LOCAL_PROP", "UNIMATCH_FUSE_UPSAMPLE")


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


def _ab_pair(name, fns, args_by_arm, n=24, reps=2):
    """Interleaved isolated A/B; first rep of each arm gets min_warmup_s."""
    res = {}
    for rep in range(reps):
        for arm, fn in fns.items():
            dt = time_chained(fn, *args_by_arm[arm], n=n,
                              min_warmup_s=8 if rep == 0 else 0, warmup=2)
            res.setdefault(f"{arm}_ms", []).append(round(dt * 1e3, 3))
    emit(part=name, **res)


def stage_prop_kernel():
    from unimatch_tpu.kernels.local_corr import (
        local_window_propagation, _reference_prop)

    rng = np.random.RandomState(3)
    q = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 112, 256, 2) * 3, jnp.bfloat16)

    fused = jax.jit(lambda a, b, c: local_window_propagation(a, b, c, 1))
    ref = jax.jit(lambda a, b, c: _reference_prop(a, b, c, 1))
    got = fused(q, k, v).astype(jnp.float32)
    want = ref(q, k, v).astype(jnp.float32)
    emit(part="prop_parity",
         max_abs=float(jnp.abs(got - want).max()),
         absmax=float(jnp.abs(want).max()))
    _ab_pair("prop_iso_ab", {"fused": fused, "ref": ref},
             {"fused": (q, k, v), "ref": (q, k, v)})


def stage_upsample_kernel():
    from unimatch_tpu.kernels.upsample_fused import (
        upsample_with_mask_fused, _reference)

    rng = np.random.RandomState(4)
    flow = jnp.asarray(rng.randn(1, 112, 256, 2) * 8, jnp.bfloat16)
    mask = jnp.asarray(rng.randn(1, 112, 256, 9 * 16), jnp.bfloat16)

    fused = jax.jit(lambda f, m: upsample_with_mask_fused(f, m, 4))
    ref = jax.jit(lambda f, m: _reference(f, m, 4, False))
    got = fused(flow, mask).astype(jnp.float32)
    want = ref(flow, mask).astype(jnp.float32)
    emit(part="upsample_parity",
         max_abs=float(jnp.abs(got - want).max()),
         absmax=float(jnp.abs(want).max()))
    _ab_pair("upsample_iso_ab", {"fused": fused, "ref": ref},
             {"fused": (flow, mask), "ref": (flow, mask)})


def stage_flagship_ab():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    set_flags({})
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)

    arms = {
        "default": {},
        "prop": {"UNIMATCH_FUSE_LOCAL_PROP": "1"},
        "ups": {"UNIMATCH_FUSE_UPSAMPLE": "1"},
        "both": {"UNIMATCH_FUSE_LOCAL_PROP": "1", "UNIMATCH_FUSE_UPSAMPLE": "1"},
    }

    def mk(name):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]
        fwd.__name__ = f"flag_{name}"
        return fwd

    res, outs, failed = {}, {}, {}
    try:
        for rep in range(3):
            for name, overrides in arms.items():
                if name in failed:
                    continue
                try:
                    set_flags(overrides)
                    dt = time_chained(mk(name), params, img0, img1, n=12,
                                      min_warmup_s=8 if rep == 0 else 0, warmup=2)
                    res.setdefault(f"{name}_ms", []).append(round(dt * 1e3, 2))
                    if rep == 0:
                        outs[name] = jax.jit(mk(name))(params, img0, img1).astype(jnp.float32)
                        emit(part="flagship_progress", arm=name, ms=res[f"{name}_ms"][-1])
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    failed[name] = repr(e)[:200]
                    emit(part="flagship_progress", arm=name, error=repr(e)[:200])
    finally:
        set_flags({})
    parity = {}
    for name in arms:
        if name != "default" and name in outs and "default" in outs:
            parity[f"{name}_parity"] = round(
                float(jnp.abs(outs[name] - outs["default"]).max()), 4)
    if "default" in outs:
        parity["ref_absmax"] = round(float(jnp.abs(outs["default"]).max()), 3)
    emit(part="flagship_ab", **res, **parity, **({"failed": failed} if failed else {}))


if __name__ == "__main__":
    emit(part="session_r4i", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or ["prop_kernel", "upsample_kernel", "flagship_ab"]
    fns = {
        "prop_kernel": stage_prop_kernel,
        "upsample_kernel": stage_upsample_kernel,
        "flagship_ab": stage_flagship_ab,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r4i", status="complete", end=time.strftime("%H:%M:%S"))
