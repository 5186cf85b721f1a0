"""Round-5 batch B: levers that landed after batch A was written.

  gru_vcol_ab      column-strip vertical GRU pass (UNIMATCH_GRU_VCOL) vs the
                   row-band form, isolated gru-v x6 at the flagship s1 shape
                   (the strip form drops the banded jnp.take duplication)
  depth_volume_ab  GMDepth-scale1 full forward + isolated plane-sweep corr,
                   UNIMATCH_DEPTH_VOLUME=1 (prebuilt [P,HW] volume + scalar
                   gathers) vs 0 (grid-sample warp) — VERDICT r4 task #2
  depth_bb2_ab     CNNEncoder at the GMDepth 480x640 shape with the fused
                   conv+IN residual blocks (UNIMATCH_FUSE_BB2) — batch A only
                   measured the flagship 448x1024 shape

Appends JSON lines to /tmp/tpu_r5b_results.jsonl (commit to
docs/artifacts_round5_tpu.jsonl afterwards).
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

OUT = "/tmp/tpu_r5b_results.jsonl"
TOUCHED = (
    "UNIMATCH_GRU_VCOL", "UNIMATCH_GRU_T", "UNIMATCH_DEPTH_VOLUME",
    "UNIMATCH_FUSE_BB2",
)


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


# ---------------------------------------------------------------------------


def stage_gru_vcol_ab():
    from unimatch_tpu.kernels.gru_fused import gru_pass

    rng = np.random.RandomState(9)
    dt = jnp.bfloat16
    net = jnp.asarray(rng.randn(1, 112, 256, 128) * 0.5, dt)
    x = jnp.asarray(rng.randn(1, 112, 256, 256), dt)
    kxv = jnp.asarray(rng.randn(5, 1, 256, 384) * 0.1, jnp.float32)
    khzrv = jnp.asarray(rng.randn(5, 1, 128, 256) * 0.1, jnp.float32)
    kqhv = jnp.asarray(rng.randn(5, 1, 128, 128) * 0.1, jnp.float32)
    bz = jnp.asarray(rng.randn(3, 128) * 0.1, jnp.float32)

    def gruv6(h0, xx):
        h = h0
        for _ in range(6):
            h = gru_pass(h, xx, kxv, khzrv, kqhv, bz, horizontal=False)
        return h

    res, outs = {}, {}
    try:
        for rep in range(2):
            for wc in ("0", "16", "32", "64", "128"):
                try:
                    set_flags({"UNIMATCH_GRU_VCOL": wc})
                    res.setdefault(f"vcol{wc}_ms", []).append(
                        _t(gruv6, net, x, rep0=rep == 0))
                    if rep == 0 and wc in ("0", "32"):
                        outs[wc] = jax.jit(gruv6)(net, x)
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    res[f"vcol{wc}_err"] = repr(e)[:200]
    finally:
        set_flags({})
    if len(outs) == 2:
        a, b = outs.values()
        res["parity_max_abs"] = float(
            jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        res["absmax"] = float(jnp.abs(a.astype(jnp.float32)).max())
    emit(part="gru_vcol_ab", **res)


# ---------------------------------------------------------------------------


def _depth_fwd():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMDEPTH_SCALE1
    model = UniMatch(config=cfg)
    shape = (480, 640)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, *shape, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, *shape, 3) * 255, jnp.bfloat16)
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


def stage_depth_volume_ab():
    """GMDepth full forward + isolated plane-sweep corr, volume vs warp."""
    from unimatch_tpu.ops.correlation import correlation_softmax_depth

    rng = np.random.RandomState(21)
    dt = jnp.bfloat16
    # isolated plane-sweep at the GMDepth s1 matching shape (60x80, C=128,
    # D=64 candidates, bidir concat handled inside)
    f0 = jnp.asarray(rng.randn(1, 60, 80, 128) * 0.5, dt)
    f1 = jnp.asarray(rng.randn(1, 60, 80, 128) * 0.5, dt)
    intr = jnp.asarray([[[65.0, 0, 40.0], [0, 65.0, 30.0], [0, 0, 1]]], jnp.float32)
    pose = np.eye(4, dtype=np.float32)[None]
    pose[:, 0, 3] = 0.15
    pose = jnp.asarray(pose)
    dcand = jnp.asarray(
        np.linspace(0.5, 10.0, 64, dtype=np.float32)[None, :, None, None]
        * np.ones((1, 1, 60, 80), np.float32)
    )

    def sweep(a, b):
        d, _ = correlation_softmax_depth(a, b, intr, pose, dcand)
        return d

    res, outs = {}, {}
    try:
        for rep in range(2):
            for name, ov in (("warp", {}), ("vol", {"UNIMATCH_DEPTH_VOLUME": "1"})):
                try:
                    set_flags(ov)
                    res.setdefault(f"sweep_{name}_ms", []).append(
                        _t(sweep, f0, f1, rep0=rep == 0))
                    if rep == 0:
                        outs[name] = jax.jit(sweep)(f0, f1)
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    res[f"sweep_{name}_err"] = repr(e)[:200]
    finally:
        set_flags({})
    if len(outs) == 2:
        a, b = outs.values()
        res["sweep_parity_max_abs"] = float(
            jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
        res["sweep_absmax"] = float(jnp.abs(a.astype(jnp.float32)).max())

    # full GMDepth forward A/B
    fwd, params, a, b = _depth_fwd()
    try:
        for rep in range(2):
            for name, ov in (("warp", {}), ("vol", {"UNIMATCH_DEPTH_VOLUME": "1"})):
                try:
                    set_flags(ov)
                    res.setdefault(f"fwd_{name}_ms", []).append(
                        _t(fwd, params, a, b, rep0=rep == 0))
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    res[f"fwd_{name}_err"] = repr(e)[:200]
    finally:
        set_flags({})
    emit(part="depth_volume_ab", **res)


def stage_depth_bb2_ab():
    from unimatch_tpu.models.backbone import CNNEncoder

    rng = np.random.RandomState(13)
    dt = jnp.bfloat16
    img = jnp.asarray(rng.randn(2, 480, 640, 3), dt)
    enc = CNNEncoder(output_dim=128, num_output_scales=1)
    with jax.default_device(jax.devices("cpu")[0]):
        imgc = jnp.asarray(np.asarray(img, np.float32), dt)
        params = enc.init(jax.random.PRNGKey(0), imgc)
    params = jax.tree.map(lambda a: a.astype(dt) if a.dtype == jnp.float32 else a,
                          params)
    params = jax.device_put(params, jax.devices()[0])

    def efwd(p, v):
        return enc.apply(p, v)[-1]

    res, outs = {}, {}
    try:
        for rep in range(2):
            for name, ov in (("off", {}), ("on", {"UNIMATCH_FUSE_BB2": "1"})):
                try:
                    set_flags(ov)
                    res.setdefault(f"enc_{name}_ms", []).append(
                        _t(efwd, params, img, rep0=rep == 0))
                    if rep == 0:
                        outs[name] = jax.jit(efwd)(params, img)
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    res[f"enc_{name}_err"] = repr(e)[:200]
    finally:
        set_flags({})
    if len(outs) == 2:
        a, b = outs.values()
        res["enc_parity_max_abs"] = float(
            jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
    emit(part="depth_bb2_ab", **res)


if __name__ == "__main__":
    emit(part="session_r5b", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or ["gru_vcol_ab", "depth_volume_ab", "depth_bb2_ab"]
    fns = {
        "gru_vcol_ab": stage_gru_vcol_ab,
        "depth_volume_ab": stage_depth_volume_ab,
        "depth_bb2_ab": stage_depth_bb2_ab,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r5b", status="complete", end=time.strftime("%H:%M:%S"))
