"""Round-4 batch F: stereo 1-D streaming corr debut + final-defaults confirm.

  stereo_1d_kernel   first real Mosaic compile of the 1-D streaming disp
                     kernel + on-chip parity + isolated A/B
  stereo_final_ab    gmstereo_scale2_regrefine3 at final defaults vs
                     +UNIMATCH_FUSE_LOCAL_CORR_1D
  flagship_final     single-arm sanity of the final default set

Appends JSON lines to /tmp/tpu_r4f_results.jsonl.
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

OUT = "/tmp/tpu_r4f_results.jsonl"
TOUCHED = ("UNIMATCH_FUSE_LOCAL_CORR_1D",)


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


def stage_stereo_1d_kernel():
    from unimatch_tpu.kernels.local_corr import (
        local_corr_softmax_disp, _reference_disp,
    )

    rng = np.random.RandomState(7)
    # stereo scale2 s1 feature shape
    f0 = jnp.asarray(rng.randn(1, 96, 312, 128), jnp.bfloat16)
    f1 = jnp.asarray(rng.randn(1, 96, 312, 128), jnp.bfloat16)

    got = jax.jit(lambda a, b: local_corr_softmax_disp(a, b, 4))(f0, f1)
    ref = jax.jit(lambda a, b: _reference_disp(a, b, 4))(f0, f1)
    emit(part="stereo_1d_parity",
         max_abs_diff=float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(ref.astype(jnp.float32)).max()))

    res = {}
    for rep in range(2):
        res.setdefault("kernel_ms", []).append(round(time_chained(
            lambda a, b: local_corr_softmax_disp(a, b, 4), f0, f1, n=24,
            min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))
        res.setdefault("xla_ms", []).append(round(time_chained(
            lambda a, b: _reference_disp(a, b, 4), f0, f1, n=24,
            min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))
    emit(part="stereo_1d_iso_ab", **res)


def stage_stereo_final_ab():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMSTEREO_SCALE2_REGREFINE3
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 384, 1248, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 384, 1248, 3) * 255, jnp.bfloat16)
    set_flags({})
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mk(name):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ = f"stereo_{name}"
        return fwd

    res, outs, failed = {}, {}, {}
    arms = {"default": {}, "corr1d": {"UNIMATCH_FUSE_LOCAL_CORR_1D": "1"}}
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
                        emit(part="stereo_final_progress", arm=name,
                             ms=res[f"{name}_ms"][-1])
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    failed[name] = repr(e)[:200]
                    emit(part="stereo_final_progress", arm=name, error=repr(e)[:200])
    finally:
        set_flags({})
    parity = {}
    if "corr1d" in outs and "default" in outs:
        parity["corr1d_parity"] = round(
            float(jnp.abs(outs["corr1d"] - outs["default"]).max()), 4)
    emit(part="stereo_final_ab", **res, **parity,
         **({"failed": failed} if failed else {}))


def stage_flagship_final():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    set_flags({})
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def fwd(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    res = [round(time_chained(fwd, params, img0, img1, n=12,
                              min_warmup_s=8 if i == 0 else 0,
                              warmup=2) * 1e3, 2) for i in range(3)]
    emit(part="flagship_final_defaults", ms=res)


if __name__ == "__main__":
    emit(part="session_r4f", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    guarded(stage_stereo_1d_kernel)
    guarded(stage_stereo_final_ab)
    guarded(stage_flagship_final)
    emit(part="session_r4f", status="complete", end=time.strftime("%H:%M:%S"))
