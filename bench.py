"""Benchmark: flagship GMFlow-scale2-regrefine6 forward at Sintel resolution.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline: reference GMFlow-scale2-regrefine6 = 122 ms on A100 (MODEL_ZOO.md:25-28)
=> 8.197 image pairs/sec. vs_baseline = our pairs/sec / 8.197.

Methodology mirrors the reference timing (MODEL_ZOO.md:5, evaluate_flow.py:401-421):
batch size 1, average over N runs, device-synchronized (block_until_ready).
"""

import json
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.config import GMFLOW_SCALE2_REGREFINE6
from unimatch_tpu.models.unimatch import UniMatch

A100_PAIRS_PER_SEC = 1000.0 / 122.0  # 8.197

H = int(os.environ.get("BENCH_H", 448))
W = int(os.environ.get("BENCH_W", 1024))
RUNS = int(os.environ.get("BENCH_RUNS", 50))
WARMUP = int(os.environ.get("BENCH_WARMUP", 5))
DTYPE = os.environ.get("BENCH_DTYPE", "bf16")


def main():
    cfg, infer = GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)

    rng = np.random.RandomState(0)
    img0 = jnp.asarray((rng.rand(1, H, W, 3) * 255).astype(np.float32))
    img1 = jnp.asarray((rng.rand(1, H, W, 3) * 255).astype(np.float32))

    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    if DTYPE == "bf16":
        # bf16 params & activations, fp32 softmax/accumulation inside the ops
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params)
        img0 = img0.astype(jnp.bfloat16)
        img1 = img1.astype(jnp.bfloat16)

    @jax.jit
    def fwd(params, a, b):
        return model.apply(params, a, b, infer=infer)["flow_preds"][-1]

    from unimatch_tpu.utils.benchmark import time_chained

    dt = time_chained(fwd, params, img0, img1, n=RUNS, warmup=WARMUP)

    pairs_per_sec = 1.0 / dt
    print(
        json.dumps(
            {
                "metric": f"gmflow_scale2_regrefine6_{H}x{W}_bs1_pairs_per_sec",
                "value": round(pairs_per_sec, 3),
                "unit": "image_pairs/sec/chip",
                "vs_baseline": round(pairs_per_sec / A100_PAIRS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
