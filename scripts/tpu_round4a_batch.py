"""Round-4 on-chip batch A: staged perf levers, measured SOLO, then combined.

One TPU session, every experiment guarded so a relay outage mid-batch loses
only the remaining stages. Addresses VERDICT round-3 items 2/3/6 and the
three ADVICE findings:
  * every env-flag toggle is inside try/finally (3j leak lesson),
  * both A/B arms get the same warmup treatment (min_warmup_s=8 on the
    compile rep, then interleaved reps with the compile rep discarded),
  * motion and swin are measured as SOLO flagship arms before any combined
    default flip.

Stages:
  backbone_conv_ab   full-backbone A/B: shifted-matmul vs lax.conv (bf16)
  motion_parity      fused motion encoder on-chip compile + parity (small)
  swin_layer_parity  fused spatial swin ONE-layer on-chip parity bound
  flagship_arms      flagship forward: default(scan) / noscan / conv_lax /
                     motion / swin — compile walltime + parity + interleaved
                     timing for each arm
  combo              winners (median < 0.97x default, parity sane) combined,
                     interleaved vs default

Appends JSON lines to /tmp/tpu_r4a_results.jsonl.
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

OUT = "/tmp/tpu_r4a_results.jsonl"

# every flag any arm touches; restored to these defaults in finally blocks
FLAG_DEFAULTS = {
    "UNIMATCH_REFINE_SCAN": "1",
    "UNIMATCH_CONV_LAX": "0",
    "UNIMATCH_FUSE_MOTION": "0",
    "UNIMATCH_SWIN_SPATIAL": "0",
}

ARMS = {
    "default": {},
    "noscan": {"UNIMATCH_REFINE_SCAN": "0"},
    "conv_lax": {"UNIMATCH_CONV_LAX": "1"},
    "motion": {"UNIMATCH_FUSE_MOTION": "1"},
    "swin": {"UNIMATCH_SWIN_SPATIAL": "1"},
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
    for k, v in FLAG_DEFAULTS.items():
        os.environ[k] = overrides.get(k, v)


def reset_flags():
    set_flags({})


def bf(rng, *shape, scale=1.0):
    return jnp.asarray(rng.rand(*shape) * scale, jnp.bfloat16)


def stage_backbone_conv_ab():
    """Full backbone (both images) at bench shape: matmul vs lax.conv."""
    from unimatch_tpu.models.backbone import CNNEncoder

    bb = CNNEncoder(output_dim=128, num_output_scales=2)
    x = bf(np.random.RandomState(1), 2, 448, 1024, 3, scale=2.0)
    reset_flags()
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16), bb.init(jax.random.PRNGKey(0), x)
    )

    def mk(tag):
        def fwd(p, a):
            return bb.apply(p, a)[-1]

        fwd.__name__ = f"bb_{tag}"
        return fwd

    res, outs = {}, {}
    try:
        for rep in range(3):
            for tag, flag in (("matmul", "0"), ("lax", "1")):
                os.environ["UNIMATCH_CONV_LAX"] = flag
                fn = mk(tag)
                dt = time_chained(
                    fn, params, x, n=16, min_warmup_s=8 if rep == 0 else 0,
                    warmup=2,
                )
                res.setdefault(tag, []).append(round(dt * 1e3, 2))
                if rep == 0:
                    outs[tag] = jax.jit(fn)(params, x).astype(jnp.float32)
    finally:
        reset_flags()
    d = float(jnp.abs(outs["matmul"] - outs["lax"]).max())
    emit(part="backbone_conv_ab", matmul_ms=res["matmul"], lax_ms=res["lax"],
         parity_max_abs=round(d, 5),
         ref_absmax=round(float(jnp.abs(outs["matmul"]).max()), 3))


def stage_motion_parity():
    """Fused motion encoder: on-chip compile + parity at the flagship s1 shape."""
    from unimatch_tpu.models.reg_refine import BasicMotionEncoder

    enc = BasicMotionEncoder(flow_channels=2)
    rng = np.random.RandomState(3)
    flow = jnp.asarray(rng.randn(1, 112, 256, 2) * 3.0, jnp.bfloat16)
    corr = jnp.asarray(rng.randn(1, 112, 256, 81), jnp.bfloat16)
    reset_flags()
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          enc.init(jax.random.PRNGKey(0), flow, corr))
    try:
        os.environ["UNIMATCH_FUSE_MOTION"] = "0"
        ref = jax.jit(lambda: enc.apply(params, flow, corr)[0])()
        os.environ["UNIMATCH_FUSE_MOTION"] = "1"
        fused = jax.jit(lambda: enc.apply(params, flow, corr)[0])()
    finally:
        reset_flags()
    emit(part="motion_parity",
         max_abs_diff=float(jnp.abs(fused.astype(jnp.float32) - ref.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(ref.astype(jnp.float32)).max()))


def stage_swin_layer_parity():
    """ONE transformer layer, fused spatial swin vs XLA, on-chip bf16 bound.

    Round 3 only had a 6-layer chained parity (3.6 on 19.6 absmax) which
    cannot separate per-layer kernel error from bf16 drift amplification;
    VERDICT asks for a single-layer bound before the kernel can default on.
    """
    from unimatch_tpu.models.transformer import FeatureTransformer

    tr = FeatureTransformer(num_layers=1, d_model=128, ffn_dim_expansion=4)
    rng = np.random.RandomState(5)
    f0 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    f1 = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    reset_flags()
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          tr.init(jax.random.PRNGKey(0), f0, f1,
                                  attn_type="swin", attn_num_splits=8))

    def run():
        return tr.apply(params, f0, f1, attn_type="swin", attn_num_splits=8)[0]

    try:
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "0"
        ref = jax.jit(run)().astype(jnp.float32)
        os.environ["UNIMATCH_SWIN_SPATIAL"] = "1"
        fused = jax.jit(run)().astype(jnp.float32)
    finally:
        reset_flags()
    emit(part="swin_layer_parity",
         max_abs_diff=float(jnp.abs(fused - ref).max()),
         ref_absmax=float(jnp.abs(ref).max()))


def _flagship_setup():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    reset_flags()
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mk(tag):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

        fwd.__name__ = f"fwd_{tag}"
        return fwd

    return mk, params, img0, img1


def stage_flagship_arms():
    """Each lever as a SOLO flagship arm: compile wall, parity, interleaved ms."""
    mk, params, img0, img1 = _flagship_setup()
    outs, times, compile_wall, failed = {}, {}, {}, {}

    # compile + warm each arm once (symmetric min_warmup_s across arms)
    for name, overrides in ARMS.items():
        try:
            set_flags(overrides)
            t0 = time.time()
            fn = mk(name)
            dt = time_chained(fn, params, img0, img1, n=8, min_warmup_s=8, warmup=2)
            compile_wall[name] = round(time.time() - t0 - 8 * dt, 1)
            outs[name] = jax.jit(fn)(params, img0, img1).astype(jnp.float32)
            times.setdefault(name, []).append(round(dt * 1e3, 1))
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            failed[name] = repr(e)[:200]
        finally:
            reset_flags()

    # interleaved timing reps (rep-0 compile samples above are kept but the
    # decision statistic is the median over these interleaved reps)
    decide = {}
    try:
        for rep in range(3):
            for name, overrides in ARMS.items():
                if name in failed:
                    continue
                set_flags(overrides)
                fn = mk(name)
                dt = time_chained(fn, params, img0, img1, n=12, warmup=2)
                decide.setdefault(name, []).append(dt * 1e3)
    finally:
        reset_flags()

    report = {}
    for name in ARMS:
        if name in failed:
            report[name] = {"error": failed[name]}
            continue
        ms = decide.get(name, [])
        report[name] = {
            "compile_wall_s": compile_wall.get(name),
            "interleaved_ms": [round(x, 1) for x in ms],
            "median_ms": round(sorted(ms)[len(ms) // 2], 1) if ms else None,
            "best_ms": round(min(ms), 1) if ms else None,
            "parity_vs_default": round(
                float(jnp.abs(outs[name] - outs["default"]).max()), 4
            ) if name in outs and "default" in outs else None,
        }
    emit(part="flagship_arms", report=report)

    # persist decisions for the combo stage
    with open("/tmp/r4a_arm_medians.json", "w") as f:
        json.dump({k: v.get("median_ms") for k, v in report.items()
                   if isinstance(v, dict)}, f)


def stage_combo():
    """Combine every solo winner; interleave vs default."""
    with open("/tmp/r4a_arm_medians.json") as f:
        med = json.load(f)
    base = med.get("default")
    if base is None:
        emit(part="combo", status="skipped", reason="no default median")
        return
    winners = [k for k, v in med.items()
               if k != "default" and v is not None and v < 0.97 * base]
    if not winners:
        emit(part="combo", status="skipped", reason="no solo winners", medians=med)
        return
    overrides = {}
    for w in winners:
        overrides.update(ARMS[w])
    mk, params, img0, img1 = _flagship_setup()
    res = {}
    try:
        for rep in range(3):
            set_flags(overrides)
            res.setdefault("combo_ms", []).append(round(time_chained(
                mk("combo"), params, img0, img1, n=12,
                min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 1))
            reset_flags()
            res.setdefault("default_ms", []).append(round(time_chained(
                mk("default2"), params, img0, img1, n=12,
                min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 1))
    finally:
        reset_flags()
    med_combo = sorted(res["combo_ms"])[len(res["combo_ms"]) // 2]
    emit(part="combo", winners=winners, **res,
         combo_median_pairs_per_sec=round(1000.0 / med_combo, 2),
         combo_best_pairs_per_sec=round(1000.0 / min(res["combo_ms"]), 2))


if __name__ == "__main__":
    emit(part="session_r4a", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    guarded(stage_backbone_conv_ab)
    guarded(stage_motion_parity)
    guarded(stage_swin_layer_parity)
    guarded(stage_flagship_arms)
    guarded(stage_combo)
    emit(part="session_r4a", status="complete", end=time.strftime("%H:%M:%S"))
