"""Contingency quick batch: if the relay returns late in the round, this
measures the minimum needed to decide the default flags — small-shape
on-chip parity for every staged kernel, then ONE interleaved full-forward
A/B of all-staged-levers-on vs all-off. ~8 small jits + 2 flagship jits.
Emits to /tmp/tpu_r3z_results.jsonl. Prefer tpu_round3j_batch.py when
there is time for per-lever attribution."""

import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = "/tmp/tpu_r3z_results.jsonl"
FLAGS = ("UNIMATCH_FUSE_MOTION", "UNIMATCH_SWIN_SPATIAL",
         "UNIMATCH_FUSE_LOCAL_CORR", "UNIMATCH_FUSE_LOCAL_PROP",
         "UNIMATCH_FUSE_UPSAMPLE", "UNIMATCH_FUSE_STRIDED")


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


def _set(flags, v):
    for f in flags:
        os.environ[f] = v


def stage_parities():
    """Small-shape on-chip parity for every staged kernel (fast compiles)."""
    import unimatch_tpu.ops.correlation as C
    from unimatch_tpu.models.reg_refine import BasicMotionEncoder
    from unimatch_tpu.models.transformer import FeatureTransformer
    from unimatch_tpu.models.propagation import SelfAttnPropagation

    # compact volume (default-on path): small-shape build+lookup vs direct
    f0 = bf(1, 48, 64, 128)
    f1 = bf(1, 48, 64, 128)
    fl = bf(1, 48, 64, 2, scale=6.0)
    direct = jax.jit(lambda a, b, f: C.local_correlation_with_flow(a, b, f, 4))(f0, f1, fl)
    via = jax.jit(lambda a, b, f: C.local_correlation_with_flow_from_tiled_volume(
        C.build_tiled_correlation_volume(a, b, 4), f, 4))(f0, f1, fl)
    emit(part="parity_volume_compact",
         max_abs_diff=float(jnp.abs(via.astype(jnp.float32) - direct.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(direct.astype(jnp.float32)).max()))

    # motion encoder
    enc = BasicMotionEncoder(flow_channels=2)
    mflow = bf(1, 48, 64, 2, scale=3.0)
    mcorr = bf(1, 48, 64, 81)
    os.environ["UNIMATCH_FUSE_MOTION"] = "0"
    p = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                     enc.init(jax.random.PRNGKey(0), mflow, mcorr))
    b0 = jax.jit(lambda q, a, b: enc.apply(q, a, b)[0])(p, mflow, mcorr)
    os.environ["UNIMATCH_FUSE_MOTION"] = "1"
    a0 = jax.jit(lambda q, a, b: enc.apply(q, a, b)[0])(p, mflow, mcorr)
    os.environ["UNIMATCH_FUSE_MOTION"] = "0"
    emit(part="parity_motion",
         max_abs_diff=float(jnp.abs(a0.astype(jnp.float32) - b0.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(b0.astype(jnp.float32)).max()))

    # spatial swin (single-block s1-like and blocked s0-like in one model)
    tr = FeatureTransformer(num_layers=2, d_model=128, ffn_dim_expansion=4)
    t0 = bf(1, 56, 128, 128)
    t1 = bf(1, 56, 128, 128)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    pt = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      tr.init(jax.random.PRNGKey(0), t0, t1,
                              attn_type="swin", attn_num_splits=2))
    s0, _ = jax.jit(lambda q, a, b: tr.apply(q, a, b, attn_type="swin", attn_num_splits=2))(pt, t0, t1)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
    s1, _ = jax.jit(lambda q, a, b: tr.apply(q, a, b, attn_type="swin", attn_num_splits=2))(pt, t0, t1)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    emit(part="parity_swin_spatial_blocked",
         max_abs_diff=float(jnp.abs(s1.astype(jnp.float32) - s0.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(s0.astype(jnp.float32)).max()))
    t0s = bf(1, 48, 64, 128)
    t1s = bf(1, 48, 64, 128)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    pts = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                       tr.init(jax.random.PRNGKey(1), t0s, t1s,
                               attn_type="swin", attn_num_splits=4))
    u0, _ = jax.jit(lambda q, a, b: tr.apply(q, a, b, attn_type="swin", attn_num_splits=4))(pts, t0s, t1s)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
    u1, _ = jax.jit(lambda q, a, b: tr.apply(q, a, b, attn_type="swin", attn_num_splits=4))(pts, t0s, t1s)
    os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
    emit(part="parity_swin_spatial_single",
         max_abs_diff=float(jnp.abs(u1.astype(jnp.float32) - u0.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(u0.astype(jnp.float32)).max()))

    # streaming local corr + prop
    os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "1"
    lc1 = jax.jit(lambda a, b: C.local_correlation_softmax_flow(a, b, 4))(f0, f1)
    os.environ["UNIMATCH_FUSE_LOCAL_CORR"] = "0"
    lc0 = jax.jit(lambda a, b: C.local_correlation_softmax_flow(a, b, 4))(f0, f1)
    emit(part="parity_local_corr",
         max_abs_diff=float(jnp.abs(lc1.astype(jnp.float32) - lc0.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(lc0.astype(jnp.float32)).max()))

    prop = SelfAttnPropagation(in_channels=128)
    os.environ["UNIMATCH_FUSE_LOCAL_PROP"] = "0"
    pp = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                      prop.init(jax.random.PRNGKey(0), f0, fl,
                                local_window_attn=True, local_window_radius=1))
    pr0 = jax.jit(lambda q, a, f: prop.apply(q, a, f, local_window_attn=True,
                                             local_window_radius=1))(pp, f0, fl)
    os.environ["UNIMATCH_FUSE_LOCAL_PROP"] = "1"
    pr1 = jax.jit(lambda q, a, f: prop.apply(q, a, f, local_window_attn=True,
                                                     local_window_radius=1))(pp, f0, fl)
    os.environ["UNIMATCH_FUSE_LOCAL_PROP"] = "0"
    emit(part="parity_local_prop",
         max_abs_diff=float(jnp.abs(pr1.astype(jnp.float32) - pr0.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(pr0.astype(jnp.float32)).max()))


def stage_forward_combined_ab():
    """Flagship forward: all staged levers on vs all off, interleaved."""
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    _set(FLAGS, "0")
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mkf(tag):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ += tag
        return fwd

    fa, fb = mkf("_staged"), mkf("_baseline")
    res = {}
    for rep in range(3):
        _set(FLAGS, "1")
        res.setdefault("staged_ms", []).append(round(time_chained(
            fa, params, img0, img1, n=12,
            min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
        _set(FLAGS, "0")
        res.setdefault("baseline_ms", []).append(round(time_chained(
            fb, params, img0, img1, n=12, warmup=1) * 1e3, 1))
    emit(part="forward_combined_ab", **res,
         staged_best_pairs_per_sec=round(1000.0 / min(res["staged_ms"]), 2),
         baseline_best_pairs_per_sec=round(1000.0 / min(res["baseline_ms"]), 2))


if __name__ == "__main__":
    emit(part="session", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    guarded(stage_parities)
    guarded(stage_forward_combined_ab)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
