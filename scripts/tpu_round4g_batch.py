"""Round-4 batch G: whole-step fused update debut + variant re-measure.

  update_kernel      first real Mosaic compile of kernels/update_fused.py at
                     the flagship s1 shape: parity vs the current default
                     kernel chain + isolated update-block x6 A/B
                     (falls back to UNIMATCH_UPDATE_T=4 if T=8 OOMs VMEM)
  flagship_update_ab flagship forward default vs UNIMATCH_FUSE_UPDATE=1
  stereo_update_ab   gmstereo_scale2_regrefine3, same A/B (fd=1, W=312)
  variants_final     gmflow scale1 / scale2 / gmdepth scale1 at the current
                     final defaults (round-3 numbers predate several flips)

Appends JSON lines to /tmp/tpu_r4g_results.jsonl.
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

OUT = "/tmp/tpu_r4g_results.jsonl"
TOUCHED = ("UNIMATCH_FUSE_UPDATE", "UNIMATCH_UPDATE_T")


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


def _update_block_args(fd, h, w, seed=7):
    from unimatch_tpu.models.reg_refine import BasicUpdateBlock

    rng = np.random.RandomState(seed)
    net = jnp.asarray(rng.randn(1, h, w, 128) * 0.5, jnp.bfloat16)
    inp = jnp.asarray(np.maximum(rng.randn(1, h, w, 128), 0), jnp.bfloat16)
    corr = jnp.asarray(rng.randn(1, h, w, 81), jnp.bfloat16)
    flow = jnp.asarray(rng.randn(1, h, w, fd) * 3, jnp.bfloat16)
    blk = BasicUpdateBlock(downsample_factor=4 if fd == 1 else 8, flow_dim=fd)
    set_flags({})
    params = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)
    return blk, params, net, inp, corr, flow


def stage_update_kernel():
    blk, params, net, inp, corr, flow = _update_block_args(2, 112, 256)

    def step6(p, n0, i0, c0, f0):
        n, f = n0, f0
        for _ in range(6):
            n, _, d = blk.apply(p, n, i0, c0, f, with_mask=False)
            f = f + d
        return n, f

    # parity: fused vs the current default kernel chain, one step
    set_flags({})
    want_n, _, want_d = jax.jit(
        lambda p, n, i, c, f: blk.apply(p, n, i, c, f, with_mask=False)
    )(params, net, inp, corr, flow)

    got = None
    for t in ("8", "4"):
        try:
            set_flags({"UNIMATCH_FUSE_UPDATE": "1", "UNIMATCH_UPDATE_T": t})
            got = jax.jit(
                lambda p, n, i, c, f: blk.apply(p, n, i, c, f, with_mask=False)
            )(params, net, inp, corr, flow)
            emit(part="update_kernel_T", T=int(t))
            break
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            emit(part="update_kernel_T", T=int(t), error=repr(e)[:300])
            got = None
    if got is None:
        set_flags({})
        raise RuntimeError("fused update failed to compile at T=8 and T=4")
    t_ok = os.environ["UNIMATCH_UPDATE_T"]
    os.environ["R4G_UPDATE_T"] = t_ok  # not in TOUCHED: persists across stages

    gn = got[0].astype(jnp.float32)
    gd = got[2].astype(jnp.float32)
    emit(
        part="update_parity",
        net_max_abs=float(jnp.abs(gn - want_n.astype(jnp.float32)).max()),
        net_absmax=float(jnp.abs(want_n.astype(jnp.float32)).max()),
        delta_max_abs=float(jnp.abs(gd - want_d.astype(jnp.float32)).max()),
        delta_absmax=float(jnp.abs(want_d.astype(jnp.float32)).max()),
    )

    res = {}
    try:
        for rep in range(2):
            set_flags({"UNIMATCH_FUSE_UPDATE": "1", "UNIMATCH_UPDATE_T": t_ok})
            res.setdefault("fused_ms", []).append(round(time_chained(
                step6, params, net, inp, corr, flow, n=16,
                min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))
            set_flags({})
            res.setdefault("default_ms", []).append(round(time_chained(
                step6, params, net, inp, corr, flow, n=16,
                min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))
    finally:
        set_flags({})
    emit(part="update_iso_x6_ab", T=int(t_ok), **res)


def _model_ab(tag, cfg_name, shape, arms, n=12, reps=3):
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = getattr(cfgs, cfg_name)
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, *shape, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, *shape, 3) * 255, jnp.bfloat16)
    set_flags({})
    init_kwargs = {}
    if cfg.task == "depth":
        pose = np.eye(4, dtype=np.float32)[None]
        pose[:, 0, 3] = 0.1  # nonzero baseline: non-degenerate plane sweep
        init_kwargs = dict(
            intrinsics=jnp.asarray(
                [[[520.0, 0, shape[1] / 2], [0, 520.0, shape[0] / 2], [0, 0, 1]]],
                jnp.float32,
            ),
            pose=jnp.asarray(pose),
        )
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer, **init_kwargs)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mk(name):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer, **init_kwargs)["flow_preds"][-1]

        fwd.__name__ = f"{tag}_{name}"
        return fwd

    res, outs, failed = {}, {}, {}
    try:
        for rep in range(reps):
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
                        emit(part=f"{tag}_progress", arm=name, ms=res[f"{name}_ms"][-1])
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    failed[name] = repr(e)[:200]
                    emit(part=f"{tag}_progress", arm=name, error=repr(e)[:200])
    finally:
        set_flags({})
    parity = {}
    names = list(arms)
    if len(names) == 2 and all(x in outs for x in names):
        parity[f"{names[1]}_parity"] = round(
            float(jnp.abs(outs[names[1]] - outs[names[0]]).max()), 4)
        parity["ref_absmax"] = round(float(jnp.abs(outs[names[0]]).max()), 3)
    emit(part=f"{tag}_ab", **res, **parity, **({"failed": failed} if failed else {}))


def stage_flagship_update_ab():
    t_ok = os.environ.get("R4G_UPDATE_T", "8")
    _model_ab(
        "flagship_update", "GMFLOW_SCALE2_REGREFINE6", (448, 1024),
        {"default": {}, "fupd": {"UNIMATCH_FUSE_UPDATE": "1",
                                 "UNIMATCH_UPDATE_T": t_ok}},
    )


def stage_stereo_update_ab():
    t_ok = os.environ.get("R4G_UPDATE_T", "8")
    _model_ab(
        "stereo_update", "GMSTEREO_SCALE2_REGREFINE3", (384, 1248),
        {"default": {}, "fupd": {"UNIMATCH_FUSE_UPDATE": "1",
                                 "UNIMATCH_UPDATE_T": t_ok}},
    )


def stage_variants_final():
    # single-arm re-measure at the current final defaults; round-3 numbers
    # predate the round-4 default flips
    for tag, cfg_name, shape in (
        ("var_scale1", "GMFLOW_SCALE1", (448, 1024)),
        ("var_scale2", "GMFLOW_SCALE2", (448, 1024)),
        ("var_depth", "GMDEPTH_SCALE1", (480, 640)),
    ):
        try:
            _model_ab(tag, cfg_name, shape, {"default": {}}, reps=3)
        except Exception as e:  # noqa: BLE001
            traceback.print_exc()
            emit(part=tag, status="error", error=repr(e)[:300])


if __name__ == "__main__":
    emit(part="session_r4g", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    stages = sys.argv[1:] or [
        "update_kernel", "flagship_update_ab", "stereo_update_ab",
        "variants_final",
    ]
    fns = {
        "update_kernel": stage_update_kernel,
        "flagship_update_ab": stage_flagship_update_ab,
        "stereo_update_ab": stage_stereo_update_ab,
        "variants_final": stage_variants_final,
    }
    for s in stages:
        guarded(fns[s])
    emit(part="session_r4g", status="complete", end=time.strftime("%H:%M:%S"))
