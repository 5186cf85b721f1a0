"""Round-3 on-TPU measurement batch: tiled-volume refine correlation.

Batches every TPU experiment of the round into one process (remote compiles
are slow and serialized; see CLAUDE.md). Emits JSON lines to stdout and
/tmp/tpu_r3_results.jsonl (appended incrementally so partial failures still
leave data). Methodology per docs/PERF_NOTES.md: time-based warmup, A/B
candidates interleaved in one session, first rep treated as suspect.

Parts, cheapest compile first:
  1. lookup kernel (Mosaic) vs jnp twin: parity + timing at bench pixel count
  2. volume build kernel vs XLA einsum: parity + timing at bench shape
  3. isolated refine corr: direct gather vs build+6 lookups at bench shape
  4. full flagship forward: volume path vs direct path, interleaved
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

OUT = "/tmp/tpu_r3_results.jsonl"


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
    except Exception as e:  # noqa: BLE001 - keep the batch going
        traceback.print_exc()
        emit(part=fn.__name__, status="error", error=repr(e)[:500])


from unimatch_tpu.utils.benchmark import time_chained  # noqa: E402

# bench scale-1 refine shape (flagship 448x1024 at 1/4)
H, W, C = 112, 256, 128
K = 9  # 2*4+1


def part1_lookup():
    from unimatch_tpu.kernels.corr_volume import lookup_select_blend, _lookup_reference

    rng = np.random.RandomState(0)
    n = H * W
    g = jnp.asarray(rng.randn(4, n, 256), jnp.bfloat16)
    sc = jnp.asarray(
        np.stack(
            [rng.randint(0, 16, n), rng.randint(0, 16, n), rng.rand(n), rng.rand(n)],
            axis=-1,
        ),
        jnp.float32,
    )
    scale = 1.0 / np.sqrt(C)

    pal = jax.jit(lambda g, sc: lookup_select_blend(g, sc, K, scale, jnp.bfloat16))
    twin = jax.jit(lambda g, sc: _lookup_reference(g, sc, K, scale, jnp.bfloat16))
    a = np.asarray(pal(g, sc), np.float32)
    b = np.asarray(twin(g, sc), np.float32)
    emit(part="lookup_parity", max_abs_err=float(np.abs(a - b).max()),
         ref_absmax=float(np.abs(b).max()))

    dt_p1 = time_chained(pal, g, sc, n=30, min_warmup_s=5)
    dt_x = time_chained(twin, g, sc, n=10, min_warmup_s=5)
    dt_p2 = time_chained(pal, g, sc, n=30, warmup=2)
    emit(part="lookup_time", pallas_ms=round(dt_p1 * 1e3, 2),
         pallas_ms_rep2=round(dt_p2 * 1e3, 2), xla_twin_ms=round(dt_x * 1e3, 2))


def part2_build():
    from unimatch_tpu.kernels.corr_volume import build_volume, _build_reference

    rng = np.random.RandomState(1)
    p, m = H * W, 144 // 16 * (288 // 16) * 256  # 28672 x 41472
    f0 = jnp.asarray(rng.randn(1, p, C), jnp.bfloat16)
    f1b = jnp.asarray(rng.randn(1, m, C), jnp.bfloat16)

    pal = jax.jit(lambda a, b: build_volume(a, b, out_dtype=jnp.bfloat16))
    ein = jax.jit(lambda a, b: _build_reference(a, b, jnp.bfloat16))
    va = pal(f0, f1b)
    vb = ein(f0, f1b)
    diff = jax.jit(
        lambda x, y: jnp.max(jnp.abs(x[:, :p].astype(jnp.float32) - y.astype(jnp.float32)))
    )(va, vb)
    emit(part="build_parity", max_abs_err=float(diff))
    del va, vb

    dt_p1 = time_chained(pal, f0, f1b, n=8, min_warmup_s=5)
    dt_x = time_chained(ein, f0, f1b, n=4, min_warmup_s=5)
    dt_p2 = time_chained(pal, f0, f1b, n=8, warmup=1)
    emit(part="build_time", pallas_ms=round(dt_p1 * 1e3, 2),
         pallas_ms_rep2=round(dt_p2 * 1e3, 2), xla_einsum_ms=round(dt_x * 1e3, 2))


def part3_corr_ab():
    from unimatch_tpu.ops import correlation as Cops

    rng = np.random.RandomState(2)
    f0 = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    f1 = jnp.asarray(rng.randn(1, H, W, C), jnp.bfloat16)
    flows = jnp.asarray(rng.randn(6, 1, H, W, 2) * 20, jnp.bfloat16)

    def direct6(f0, f1, flows):
        out = 0.0
        for i in range(6):
            out = out + Cops.local_correlation_with_flow(f0, f1, flows[i], 4).astype(jnp.float32)
        return out

    def vol6(f0, f1, flows):
        vol = Cops.build_tiled_correlation_volume(f0, f1, 4)
        out = 0.0
        for i in range(6):
            out = out + Cops.local_correlation_with_flow_from_tiled_volume(
                vol, flows[i], 4
            ).astype(jnp.float32)
        return out

    # parity of one iteration (bf16 volume vs direct rounding differences)
    d1 = jax.jit(lambda a, b, f: Cops.local_correlation_with_flow(a, b, f[0], 4))(f0, f1, flows)
    v1 = jax.jit(
        lambda a, b, f: Cops.local_correlation_with_flow_from_tiled_volume(
            Cops.build_tiled_correlation_volume(a, b, 4), f[0], 4
        )
    )(f0, f1, flows)
    err = float(jnp.max(jnp.abs(d1.astype(jnp.float32) - v1.astype(jnp.float32))))
    ref = float(jnp.max(jnp.abs(d1.astype(jnp.float32))))
    emit(part="corr_parity_1iter", max_abs_err=err, ref_absmax=ref)

    dt_d1 = time_chained(direct6, f0, f1, flows, n=10, min_warmup_s=5)
    dt_v1 = time_chained(vol6, f0, f1, flows, n=10, min_warmup_s=5)
    dt_d2 = time_chained(direct6, f0, f1, flows, n=10, warmup=1)
    dt_v2 = time_chained(vol6, f0, f1, flows, n=10, warmup=1)
    emit(part="corr6_time", direct_ms=[round(dt_d1 * 1e3, 1), round(dt_d2 * 1e3, 1)],
         volume_ms=[round(dt_v1 * 1e3, 1), round(dt_v2 * 1e3, 1)])


def part4_forward_ab():
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    rng = np.random.RandomState(0)
    img0 = jnp.asarray((rng.rand(1, 448, 1024, 3) * 255).astype(np.float32))
    img1 = jnp.asarray((rng.rand(1, 448, 1024, 3) * 255).astype(np.float32))
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    img0 = img0.astype(jnp.bfloat16)
    img1 = img1.astype(jnp.bfloat16)

    # separate closures so each env-dependent trace stays distinct; env is
    # re-read at every retrace inside time_chained, so set it before each call
    def fwd_vol(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    def fwd_direct(p, a, b):
        return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

    def run(fn, env, **kw):
        os.environ["UNIMATCH_REFINE_VOLUME"] = env
        return time_chained(fn, params, img0, img1, **kw)

    reps = {"volume": [], "direct": []}
    reps["volume"].append(run(fwd_vol, "1", n=10, min_warmup_s=8))
    reps["direct"].append(run(fwd_direct, "0", n=10, min_warmup_s=8))
    for _ in range(3):
        reps["volume"].append(run(fwd_vol, "1", n=20, warmup=1))
        reps["direct"].append(run(fwd_direct, "0", n=20, warmup=1))
    emit(
        part="forward_ab",
        volume_ms=[round(x * 1e3, 1) for x in reps["volume"]],
        direct_ms=[round(x * 1e3, 1) for x in reps["direct"]],
        volume_best_pairs_per_sec=round(1.0 / min(reps["volume"]), 2),
        direct_best_pairs_per_sec=round(1.0 / min(reps["direct"]), 2),
    )
    os.environ.pop("UNIMATCH_REFINE_VOLUME", None)


if __name__ == "__main__":
    emit(part="session", backend=jax.default_backend(),
         device=str(jax.devices()[0]), start=time.strftime("%H:%M:%S"))
    guarded(part1_lookup)
    guarded(part2_build)
    guarded(part3_corr_ab)
    guarded(part4_forward_ab)
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))
