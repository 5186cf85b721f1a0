"""Depth-model FFN A/B: is the fused FFN kernel a win at GMDepth-scale1's
small token count (60x80 = 4800 tokens/dir)? Depth measured 84.5 pairs/s
this round vs 91.0 in round 2 (pre-FFN-dispatch) — inside the noise band,
but cheap to check directly. Emits to /tmp/tpu_r3h_results.jsonl."""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = "/tmp/tpu_r3h_results.jsonl"


def emit(**kw):
    line = json.dumps(kw)
    print(line, flush=True)
    with open(OUT, "a") as f:
        f.write(line + "\n")


from unimatch_tpu.utils.benchmark import time_chained  # noqa: E402
from unimatch_tpu import config as cfgs  # noqa: E402
from unimatch_tpu.models.unimatch import UniMatch  # noqa: E402


def main():
    emit(part="session", backend=jax.default_backend(), start=time.strftime("%H:%M:%S"))
    cfg, infer = cfgs.GMDEPTH_SCALE1
    model = UniMatch(config=cfg)
    H, W = 480, 640
    rng = np.random.RandomState(0)
    img0 = jnp.asarray(rng.rand(1, H, W, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(rng.rand(1, H, W, 3) * 255, jnp.bfloat16)
    K = np.array([[[520.0, 0, W / 2], [0, 520.0, H / 2], [0, 0, 1]]], np.float32)
    pose = np.eye(4, dtype=np.float32)[None]
    pose[:, 0, 3] = 0.1
    extra = {"intrinsics": jnp.asarray(K), "pose": jnp.asarray(pose)}
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer, **extra)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    def fa(p, a, b):
        return model.apply(p, a, b, infer=infer, **extra)["flow_preds"][-1]

    def fb(p, a, b):
        return model.apply(p, a, b, infer=infer, **extra)["flow_preds"][-1]

    res = {}
    for rep in range(3):
        os.environ["UNIMATCH_FUSE_FFN"] = "1"
        res.setdefault("ffn_ms", []).append(round(time_chained(
            fa, params, img0, img1, n=40,
            min_warmup_s=8 if rep == 0 else 0) * 1e3, 2))
        os.environ["UNIMATCH_FUSE_FFN"] = "0"
        res.setdefault("xla_ms", []).append(round(time_chained(
            fb, params, img0, img1, n=40, warmup=2) * 1e3, 2))
    os.environ.pop("UNIMATCH_FUSE_FFN", None)
    emit(part="depth_ffn_ab", **res,
         ffn_best_pairs_per_sec=round(1000.0 / min(res["ffn_ms"]), 2),
         xla_best_pairs_per_sec=round(1000.0 / min(res["xla_ms"]), 2))
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
