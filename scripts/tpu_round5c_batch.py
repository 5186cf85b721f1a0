"""Round-5 batch C: in-situ flagship/stereo A/Bs of the round-5 levers.

  flagship_ab   interleaved full-forward arms at 448x1024:
                default | umajor | 2stage | vcol16 | gru_t16 | combo
                (umajor + 2stage + vcol16). Fresh closures per arm for the
                parity captures (jax.jit caches traces by function identity
                — the round-5a/b parity-0.0 artifact, CLAUDE.md).
  stereo_ab     GMStereo-scale2-regrefine3 384x1248: default | combo
  bb2_lower     lowered-HLO custom-call counts for the fused conv+IN
                encoder arms (dispatch evidence for the prune decision)
  prop_ups_flagship  compile the streaming propagation / fused upsample
                kernels at the REAL flagship shapes to capture the
                scoped-VMEM OOM diagnostics the relay now surfaces

Appends JSON lines to /tmp/tpu_r5c_results.jsonl.
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

OUT = "/tmp/tpu_r5c_results.jsonl"
TOUCHED = (
    "UNIMATCH_VOLUME_UMAJOR", "UNIMATCH_MOTION_IM2COL", "UNIMATCH_GRU_VCOL",
    "UNIMATCH_GRU_T", "UNIMATCH_FUSE_BB2", "UNIMATCH_FUSE_LOCAL_PROP",
    "UNIMATCH_FUSE_UPSAMPLE",
)

ARMS = {
    "default": {},
    "umajor": {"UNIMATCH_VOLUME_UMAJOR": "1"},
    "im2stage": {"UNIMATCH_MOTION_IM2COL": "2stage"},
    "vcol16": {"UNIMATCH_GRU_VCOL": "16"},
    "grut16": {"UNIMATCH_GRU_T": "16"},
    "combo": {
        "UNIMATCH_VOLUME_UMAJOR": "1",
        "UNIMATCH_MOTION_IM2COL": "2stage",
        "UNIMATCH_GRU_VCOL": "16",
    },
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
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def fwd(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    return fwd, params, img0, img1


def _run_arms(cfg_name, shape, arm_names, tag):
    fwd, params, a, b = _variant_fwd(cfg_name, shape)
    res, outs = {}, {}
    try:
        for rep in range(3):
            for name in arm_names:
                try:
                    set_flags(ARMS[name])
                    res.setdefault(f"{name}_ms", []).append(
                        _t(fwd, params, a, b, rep0=rep == 0))
                    if rep == 0:
                        # FRESH closure per arm: jax.jit caches traces by
                        # function identity across wrappers
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


def stage_flagship_ab():
    _run_arms("GMFLOW_SCALE2_REGREFINE6", (448, 1024),
              ["default", "umajor", "im2stage", "vcol16", "grut16", "combo"],
              "flagship_ab")


def stage_stereo_ab():
    _run_arms("GMSTEREO_SCALE2_REGREFINE3", (384, 1248),
              ["default", "combo"], "stereo_ab")


def stage_bb2_lower():
    """Count pallas custom calls in the lowered encoder HLO per bb2 arm —
    records that the round-5a/b encoder A/B loss was a real dispatch."""
    from unimatch_tpu.models.backbone import CNNEncoder

    rng = np.random.RandomState(13)
    dt = jnp.bfloat16
    img = jnp.asarray(rng.randn(2, 224, 512, 3), dt)
    enc = CNNEncoder(output_dim=128, num_output_scales=2)
    params = enc.init(jax.random.PRNGKey(0), img)
    params = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                          params)
    res = {}
    try:
        for name, ov in (("off", {}), ("on", {"UNIMATCH_FUSE_BB2": "1"})):
            set_flags(ov)
            txt = jax.jit(lambda p, v: enc.apply(p, v)[-1]).lower(params, img).as_text()
            res[f"{name}_custom_calls"] = txt.count("tpu_custom_call")
    finally:
        set_flags({})
    emit(part="bb2_lower", **res)


def stage_prop_ups_flagship():
    """Flagship-shape compiles of the two historically-HTTP-500 kernels —
    the relay now surfaces the Mosaic diagnostic (round-5a found the class
    is scoped-VMEM OOM)."""
    set_flags({})
    rng = np.random.RandomState(11)
    dt = jnp.bfloat16
    try:
        from unimatch_tpu.kernels.local_corr import local_window_propagation

        feat = jnp.asarray(rng.randn(1, 112, 256, 128), dt)
        fl = jnp.asarray(rng.randn(1, 112, 256, 2), dt)
        out = local_window_propagation(feat, feat, fl, 1)
        jax.block_until_ready(out)
        emit(part="prop_compile_flagship", ok=True)
    except Exception as e:  # noqa: BLE001
        emit(part="prop_compile_flagship", ok=False, error=repr(e)[:1200])
    try:
        from unimatch_tpu.kernels.upsample_fused import upsample_with_mask_fused

        fl = jnp.asarray(rng.randn(1, 112, 256, 2), dt)
        mask = jnp.asarray(rng.randn(1, 112, 256, 576), dt)
        out = upsample_with_mask_fused(fl, mask, 8, False)
        jax.block_until_ready(out)
        emit(part="ups_compile_flagship", ok=True)
    except Exception as e:  # noqa: BLE001
        emit(part="ups_compile_flagship", ok=False, error=repr(e)[:1200])


if __name__ == "__main__":
    emit(part="session_r5c", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or [
        "flagship_ab", "stereo_ab", "bb2_lower", "prop_ups_flagship",
    ]
    fns = {
        "flagship_ab": stage_flagship_ab,
        "stereo_ab": stage_stereo_ab,
        "bb2_lower": stage_bb2_lower,
        "prop_ups_flagship": stage_prop_ups_flagship,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r5c", status="complete", end=time.strftime("%H:%M:%S"))
