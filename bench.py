"""Benchmark: flagship GMFlow-scale2-regrefine6 forward at Sintel resolution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference GMFlow-scale2-regrefine6 = 122 ms on A100 (MODEL_ZOO.md:25-28)
=> 8.197 image pairs/sec. vs_baseline = our pairs/sec / 8.197.

Methodology mirrors the reference timing (MODEL_ZOO.md:5, evaluate_flow.py:401-421):
batch size 1, averaged, device-synchronized — via the chained-execution timer
(see utils/benchmark.py for why plain block_until_ready is not used).

BENCH_CONFIG selects other model variants (their A100 baselines from
MODEL_ZOO.md): gmflow_scale1 (26 ms @448x1024), gmflow_scale2 (66 ms),
gmflow_scale2_regrefine6 (122 ms, default), gmstereo_scale2_regrefine3
(86 ms @384x1248), gmdepth_scale1 (17 ms @480x640).
"""

import json
import time
import os

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.utils.jax_cache import enable_compilation_cache

enable_compilation_cache()  # warmed .jax_cache/ makes the driver run compile-free

from unimatch_tpu import config as cfgs
from unimatch_tpu.models.unimatch import UniMatch

_CONFIGS = {
    "gmflow_scale1": (cfgs.GMFLOW_SCALE1, 1000.0 / 26.0, (448, 1024)),
    "gmflow_scale2": (cfgs.GMFLOW_SCALE2, 1000.0 / 66.0, (448, 1024)),
    "gmflow_scale2_regrefine6": (cfgs.GMFLOW_SCALE2_REGREFINE6, 1000.0 / 122.0, (448, 1024)),
    "gmstereo_scale2_regrefine3": (cfgs.GMSTEREO_SCALE2_REGREFINE3, 1000.0 / 86.0, (384, 1248)),
    "gmdepth_scale1": (cfgs.GMDEPTH_SCALE1, 1000.0 / 17.0, (480, 640)),
}

CONFIG = os.environ.get("BENCH_CONFIG", "gmflow_scale2_regrefine6")
(_cfg_pair, A100_PAIRS_PER_SEC, (_dh, _dw)) = _CONFIGS[CONFIG]

H = int(os.environ.get("BENCH_H", _dh))
W = int(os.environ.get("BENCH_W", _dw))
RUNS = int(os.environ.get("BENCH_RUNS", 50))
WARMUP = int(os.environ.get("BENCH_WARMUP", 5))
WARMUP_S = float(os.environ.get("BENCH_WARMUP_S", 10.0))
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")


def main():
    cfg, infer = _cfg_pair
    model = UniMatch(config=cfg)

    rng = np.random.RandomState(0)
    img0 = jnp.asarray((rng.rand(1, H, W, 3) * 255).astype(np.float32))
    img1 = jnp.asarray((rng.rand(1, H, W, 3) * 255).astype(np.float32))

    extra = {}
    if cfg.task == "depth":
        K = np.array([[[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]]], np.float32)
        pose = np.eye(4, dtype=np.float32)[None]
        pose[:, 0, 3] = 0.1
        extra = {"intrinsics": jnp.asarray(K), "pose": jnp.asarray(pose)}

    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer, **extra)
    if DTYPE == "bf16":
        # bf16 params & activations, fp32 softmax/accumulation inside the ops
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
        img0 = img0.astype(jnp.bfloat16)
        img1 = img1.astype(jnp.bfloat16)

    @jax.jit
    def fwd(params, a, b):
        return model.apply(params, a, b, infer=infer, **extra)["flow_preds"][-1]

    from unimatch_tpu.utils.benchmark import time_chained

    # The shared remote-TPU relay has minutes-long windows of 4-5x
    # degradation (a fixed binary measured 8.97 then 2.19 pairs/s in
    # back-to-back runs). Degradation is strictly one-sided, so measure in
    # chunks and report the best chunk's average — the steady-state
    # capability of the chip, not of the relay's worst moment.
    chunks = max(1, int(os.environ.get("BENCH_CHUNKS", 3)))
    gap_s = float(os.environ.get("BENCH_CHUNK_GAP_S", 20.0))
    # probe pass (also absorbs the slow-start window), then size chunks to
    # >= ~4 s of device time each so fast models aren't measured by a blip
    dt_probe = time_chained(fwd, params, img0, img1, n=5, warmup=WARMUP,
                            min_warmup_s=WARMUP_S)
    n_chunk = max(5, RUNS // chunks, int(4.0 / max(dt_probe, 1e-4)))
    dts = [dt_probe]
    for i in range(chunks):
        if i:
            time.sleep(gap_s)
        dts.append(time_chained(fwd, params, img0, img1, n=n_chunk, warmup=2))
    # median chunk is the PRIMARY statistic: it is two-sided-comparable with
    # the A100 *average* baseline. The best chunk (steady-state chip
    # capability — relay degradation windows are strictly one-sided) is
    # reported alongside.
    dt = min(dts)
    dt_med = sorted(dts)[len(dts) // 2]

    pairs_per_sec_med = 1.0 / dt_med
    print(
        json.dumps(
            {
                "metric": f"{CONFIG}_{H}x{W}_bs1_pairs_per_sec",
                "value": round(pairs_per_sec_med, 3),
                "unit": "image_pairs/sec/chip",
                "vs_baseline": round(pairs_per_sec_med / A100_PAIRS_PER_SEC, 3),
                "best_of_chunks": round(1.0 / dt, 3),
                "best_vs_baseline": round(1.0 / dt / A100_PAIRS_PER_SEC, 3),
                "n_chunks": len(dts),
            }
        )
    )


if __name__ == "__main__":
    main()
