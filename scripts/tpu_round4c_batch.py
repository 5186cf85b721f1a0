"""Round-4 on-chip batch C: fused two-conv head + bf16 conv partials.

Levers under test (both default-off until this batch decides):
  UNIMATCH_FUSE_HEAD          kernels/head_fused.py — FlowHead and the
                              upsample-mask head as one Pallas kernel; the
                              [*, 256] hidden never leaves VMEM and the
                              narrow (2/144-ch) output writes once in bf16
                              instead of lane-padded f32 tap partials.
  UNIMATCH_CONV_BF16_PARTIALS models/layers.py — bf16 tap-partial storage
                              in conv_via_matmul (halves the measured
                              dominant conv traffic).

Stages:
  head_kernel       compile + on-chip parity at the flagship s1 shape (both
                    head forms), isolated flow-head A/B vs the XLA chain
  bf16_backbone     full-backbone A/B at bench shape, partials bf16 vs f32
  flagship_ab       flagship forward, SOLO arms + combo, interleaved
  stereo_ab         gmstereo_scale2_regrefine3, default vs combo winners

Appends JSON lines to /tmp/tpu_r4c_results.jsonl.
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

OUT = "/tmp/tpu_r4c_results.jsonl"

TOUCHED = ("UNIMATCH_FUSE_HEAD", "UNIMATCH_CONV_BF16_PARTIALS")


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


def stage_head_kernel():
    from unimatch_tpu.kernels.head_fused import fused_head, _reference_head

    rng = np.random.RandomState(11)
    x = jnp.asarray(rng.randn(1, 112, 256, 128), jnp.bfloat16)
    k1 = jnp.asarray(rng.randn(3, 3, 128, 256) * 0.05, jnp.bfloat16)
    b1 = jnp.asarray(rng.randn(256) * 0.1, jnp.bfloat16)

    for tag, (kh2, kw2, cout) in (("flow", (3, 3, 2)), ("mask", (1, 1, 144))):
        k2 = jnp.asarray(rng.randn(kh2, kw2, 256, cout) * 0.05, jnp.bfloat16)
        b2 = jnp.asarray(rng.randn(cout) * 0.1, jnp.bfloat16)
        got = jax.jit(lambda k2=k2, b2=b2: fused_head(x, k1, b1, k2, b2))()
        ref = jax.jit(
            lambda k2=k2, b2=b2: _reference_head(x, k1, b1, k2, b2, 3, 3, kh2, kw2, "relu")
        )()
        emit(part=f"head_parity_{tag}",
             max_abs_diff=float(jnp.abs(got.astype(jnp.float32) - ref.astype(jnp.float32)).max()),
             ref_absmax=float(jnp.abs(ref.astype(jnp.float32)).max()))

    # isolated flow-head A/B: kernel vs the dispatched-off module chain
    from unimatch_tpu.models.reg_refine import FlowHead

    head = FlowHead(hidden_dim=256, out_dim=2)
    set_flags({"UNIMATCH_FUSE_HEAD": "0"})
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          head.init(jax.random.PRNGKey(0), x))

    res = {}
    for rep in range(3):
        set_flags({"UNIMATCH_FUSE_HEAD": "1"})
        res.setdefault("kernel_ms", []).append(round(time_chained(
            lambda p, t: head.apply(p, t), params, x, n=24,
            min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))
        set_flags({"UNIMATCH_FUSE_HEAD": "0"})
        res.setdefault("xla_ms", []).append(round(time_chained(
            lambda p, t: head.apply(p, t), params, x, n=24,
            min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))
    set_flags({})
    emit(part="head_isolated_ab", **res)


def stage_bf16_backbone():
    from unimatch_tpu.models.backbone import CNNEncoder

    rng = np.random.RandomState(12)
    x = jnp.asarray(rng.randn(2, 448, 1024, 3) * 50, jnp.bfloat16)
    enc = CNNEncoder(output_dim=128, num_output_scales=2)
    set_flags({})
    params = jax.tree.map(lambda a: a.astype(jnp.bfloat16),
                          enc.init(jax.random.PRNGKey(0), x))

    res = {}
    for rep in range(3):
        set_flags({"UNIMATCH_CONV_BF16_PARTIALS": "1"})
        res.setdefault("bf16_ms", []).append(round(time_chained(
            lambda p, t: enc.apply(p, t)[-1], params, x, n=20,
            min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))
        set_flags({})
        res.setdefault("f32_ms", []).append(round(time_chained(
            lambda p, t: enc.apply(p, t)[-1], params, x, n=20,
            min_warmup_s=8 if rep == 0 else 0, warmup=2) * 1e3, 2))

    set_flags({"UNIMATCH_CONV_BF16_PARTIALS": "1"})
    a = jax.jit(lambda: enc.apply(params, x)[-1])()
    set_flags({})
    b = jax.jit(lambda: enc.apply(params, x)[-1])()
    emit(part="bf16_backbone_ab", **res,
         parity=float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max()),
         ref_absmax=float(jnp.abs(b.astype(jnp.float32)).max()))


def _forward_ab(tag, cfg_pair, shape, arms):
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfg_pair
    model = UniMatch(config=cfg)
    h, w = shape
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, h, w, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, h, w, 3) * 255, jnp.bfloat16)
    set_flags({})
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def mk(name):
        def fwd(p, a, b):
            return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

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
                    dt = time_chained(mk(name), params, img0, img1, n=12,
                                      min_warmup_s=8 if rep == 0 else 0, warmup=2)
                    res.setdefault(f"{name}_ms", []).append(round(dt * 1e3, 1))
                    if rep == 0:
                        outs[name] = jax.jit(mk(name))(params, img0, img1).astype(jnp.float32)
                except Exception as e:  # noqa: BLE001
                    traceback.print_exc()
                    failed[name] = repr(e)[:200]
    finally:
        set_flags({})
    parity = {}
    base_name = next(iter(arms))
    for name, o in outs.items():
        if name != base_name and base_name in outs:
            parity[f"{name}_parity"] = round(float(jnp.abs(o - outs[base_name]).max()), 4)
    emit(part=tag, **res, **parity, **({"failed": failed} if failed else {}))


def stage_flagship_ab():
    from unimatch_tpu import config as cfgs

    _forward_ab(
        "flagship_head_bf16_ab", cfgs.GMFLOW_SCALE2_REGREFINE6, (448, 1024),
        {
            "default": {},
            "head": {"UNIMATCH_FUSE_HEAD": "1"},
            "bf16p": {"UNIMATCH_CONV_BF16_PARTIALS": "1"},
            "combo": {"UNIMATCH_FUSE_HEAD": "1", "UNIMATCH_CONV_BF16_PARTIALS": "1"},
        },
    )


def stage_stereo_ab():
    from unimatch_tpu import config as cfgs

    _forward_ab(
        "stereo_head_bf16_ab", cfgs.GMSTEREO_SCALE2_REGREFINE3, (384, 1248),
        {
            "default": {},
            "combo": {"UNIMATCH_FUSE_HEAD": "1", "UNIMATCH_CONV_BF16_PARTIALS": "1"},
        },
    )


if __name__ == "__main__":
    emit(part="session_r4c", backend=jax.default_backend(),
         start=time.strftime("%H:%M:%S"))
    guarded(stage_head_kernel)
    guarded(stage_bf16_backbone)
    guarded(stage_flagship_ab)
    guarded(stage_stereo_ab)
    emit(part="session_r4c", status="complete", end=time.strftime("%H:%M:%S"))
