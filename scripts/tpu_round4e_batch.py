"""Round-4 batch E: narrowed lookup + revived streaming kernels + depth bf16p.

Levers (all default-off until this batch decides):
  UNIMATCH_LOOKUP_NARROW     512-lane lookup shift/select (corr_volume.py)
  UNIMATCH_FUSE_LOCAL_CORR   streaming local corr (dynamic-slice fix landed)
  UNIMATCH_FUSE_LOCAL_PROP   streaming local propagation
  UNIMATCH_FUSE_UPSAMPLE     fused convex upsample
  UNIMATCH_CONV_BF16_PARTIALS (depth variant only — backbone is 47% of its
                             forward and its parity tradeoff may be worth 2x)

Stages (decision value order):
  flagship_levers   solo arms + combined winners candidate, interleaved
  lookup_iso        volume build + 6 lookups, narrow on/off
  stream_parity     on-chip parity for corr/prop/upsample kernels
  depth_levers      GMDepth-scale1 forward: default vs bf16p vs stream

Appends JSON lines to /tmp/tpu_r4e_results.jsonl.
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

OUT = "/tmp/tpu_r4e_results.jsonl"

STREAM = {"UNIMATCH_FUSE_LOCAL_CORR": "1", "UNIMATCH_FUSE_LOCAL_PROP": "1",
          "UNIMATCH_FUSE_UPSAMPLE": "1"}
TOUCHED = ("UNIMATCH_LOOKUP_NARROW", "UNIMATCH_CONV_BF16_PARTIALS",
           "UNIMATCH_FUSE_HEAD") + tuple(STREAM)


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


def _forward_ab(tag, cfg_pair, shape, arms, extra=None, n=12):
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfg_pair
    model = UniMatch(config=cfg)
    h, w = shape
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, h, w, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, h, w, 3) * 255, jnp.bfloat16)
    extra = extra or {}
    set_flags({})
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer, **extra)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mk(name):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer, **extra)["flow_preds"][-1]

        fwd.__name__ = f"{tag}_{name}"
        return fwd

    res, outs, failed = {}, {}, {}
    try:
        for rep in range(3):
            for name, overrides in arms.items():
                if name in failed:
                    continue
                try:
                    set_flags(overrides)
                    dt = time_chained(mk(name), params, img0, img1, n=n,
                                      min_warmup_s=8 if rep == 0 else 0, warmup=2)
                    res.setdefault(f"{name}_ms", []).append(round(dt * 1e3, 2))
                    if rep == 0:
                        outs[name] = jax.jit(mk(name))(params, img0, img1).astype(jnp.float32)
                        emit(part=f"{tag}_progress", arm=name,
                             ms=res[f"{name}_ms"][-1])
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    failed[name] = repr(e)[:200]
                    emit(part=f"{tag}_progress", arm=name, error=repr(e)[:200])
    finally:
        set_flags({})
    parity = {}
    base_name = next(iter(arms))
    for name, o in outs.items():
        if name != base_name and base_name in outs:
            parity[f"{name}_parity"] = round(float(jnp.abs(o - outs[base_name]).max()), 4)
    emit(part=tag, **res, **parity, **({"failed": failed} if failed else {}))


def stage_flagship_levers():
    from unimatch_tpu import config as cfgs

    _forward_ab(
        "flagship_levers_ab", cfgs.GMFLOW_SCALE2_REGREFINE6, (448, 1024),
        {
            "default": {},
            "narrow": {"UNIMATCH_LOOKUP_NARROW": "1"},
            "scorr": {"UNIMATCH_FUSE_LOCAL_CORR": "1"},
            "sprop": {"UNIMATCH_FUSE_LOCAL_PROP": "1"},
            "sup": {"UNIMATCH_FUSE_UPSAMPLE": "1"},
            "stream": dict(STREAM),
            "nst": {"UNIMATCH_LOOKUP_NARROW": "1", **STREAM},
        },
    )


def stage_lookup_iso():
    from unimatch_tpu.ops import correlation as C

    rng = np.random.RandomState(5)
    f0 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    f1 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    flow = jnp.asarray(rng.randn(1, 112, 256, 2) * 5, jnp.bfloat16)

    def build_plus_6(a, b, f):
        vol = C.build_tiled_correlation_volume(a, b, 4)
        out = jnp.zeros((), jnp.float32)
        ff = f
        for _ in range(6):
            corr = C.local_correlation_with_flow_from_tiled_volume(vol, ff, 4)
            out = out + corr.astype(jnp.float32).mean()
            ff = ff + 0.5
        return out

    res = {}
    for rep in range(3):
        set_flags({"UNIMATCH_LOOKUP_NARROW": "1"})
        res.setdefault("narrow_ms", []).append(round(time_chained(
            build_plus_6, f0, f1, flow, n=10,
            min_warmup_s=8 if rep == 0 else 0, warmup=1) * 1e3, 2))
        set_flags({})
        res.setdefault("full_ms", []).append(round(time_chained(
            build_plus_6, f0, f1, flow, n=10,
            min_warmup_s=8 if rep == 0 else 0, warmup=1) * 1e3, 2))

    def one_lookup(a, b, f):
        return C.local_correlation_with_flow_from_tiled_volume(
            C.build_tiled_correlation_volume(a, b, 4), f, 4
        )

    set_flags({"UNIMATCH_LOOKUP_NARROW": "1"})
    a = jax.jit(one_lookup)(f0, f1, flow)
    set_flags({})
    b = jax.jit(one_lookup)(f0, f1, flow)
    emit(part="lookup_iso", **res,
         parity=float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(b.astype(jnp.float32)).max()))


def stage_stream_parity():
    from unimatch_tpu.kernels.local_corr import (
        _local_corr_flow_impl, _reference_flow, _local_prop_impl, _reference_prop,
    )
    from unimatch_tpu.kernels.upsample_fused import _upsample_impl, _reference

    rng = np.random.RandomState(11)
    f0 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    f1 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    got = jax.jit(lambda a, b: _local_corr_flow_impl(a, b, 4))(f0, f1)
    ref = jax.jit(lambda a, b: _reference_flow(a, b, 4))(f0, f1)
    emit(part="local_corr_parity",
         max_abs_diff=float(jnp.abs(got - ref).max()),
         ref_absmax=float(jnp.abs(ref).max()))
    res = {}
    for rep in range(2):
        res.setdefault("kernel_ms", []).append(round(time_chained(
            lambda a, b: _local_corr_flow_impl(a, b, 4), f0, f1, n=24,
            warmup=2) * 1e3, 2))
        res.setdefault("xla_ms", []).append(round(time_chained(
            lambda a, b: _reference_flow(a, b, 4), f0, f1, n=24,
            warmup=2) * 1e3, 2))
    emit(part="local_corr_iso_ab", **res)

    q = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    k = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    v = jnp.asarray(rng.randn(1, 112, 256, 2) * 3, jnp.bfloat16)
    got = jax.jit(lambda a, b, c: _local_prop_impl(a, b, c, 1))(q, k, v)
    ref = jax.jit(lambda a, b, c: _reference_prop(a, b, c, 1))(q, k, v)
    emit(part="local_prop_parity",
         max_abs_diff=float(jnp.abs(got - ref).max()),
         ref_absmax=float(jnp.abs(ref).max()))

    flow = jnp.asarray(rng.randn(1, 112, 256, 2) * 5, jnp.bfloat16)
    mask = jnp.asarray(rng.randn(1, 112, 256, 144), jnp.bfloat16)
    got = jax.jit(lambda f, m: _upsample_impl(f, m, 4, False))(flow, mask)
    ref = jax.jit(lambda f, m: _reference(f, m, 4, False))(flow, mask)
    emit(part="upsample_parity",
         max_abs_diff=float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(ref.astype(jnp.float32)).max()))


def stage_depth_levers():
    from unimatch_tpu import config as cfgs

    h, w = 480, 640
    K = jnp.asarray(
        np.array([[[520.0, 0, w / 2], [0, 520.0, h / 2], [0, 0, 1]]], np.float32)
    )
    pose = np.eye(4, dtype=np.float32)[None]
    pose[:, 0, 3] = 0.1
    pose = jnp.asarray(pose)
    _forward_ab(
        "depth_levers_ab", cfgs.GMDEPTH_SCALE1, (h, w),
        {
            "default": {},
            "bf16p": {"UNIMATCH_CONV_BF16_PARTIALS": "1"},
        },
        extra={"intrinsics": K, "pose": pose},
        n=32,
    )


if __name__ == "__main__":
    emit(part="session_r4e", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    guarded(stage_flagship_levers)
    guarded(stage_lookup_iso)
    guarded(stage_stream_parity)
    guarded(stage_depth_levers)
    emit(part="session_r4e", status="complete", end=time.strftime("%H:%M:%S"))
