"""Per-variant Mosaic shape gate (round-4 weak #6 / round-5 task #7).

Compiles + runs every bench variant's forward at its real bench shape with
the current DEFAULT-ON kernel set, and exits non-zero on any failure. A
default-on Pallas kernel whose support gate passes a shape Mosaic rejects
(the d614103 stereo break: a gate passed 384x1248 swin windows whose blocks
violate 8-divisibility — only the real-chip compile catches this class)
fails HERE, at batch/round start, instead of silently breaking a variant at
HEAD.

Run on the real chip (compiles hit the committed .jax_cache, so a clean
re-run after warming is minutes, not hours):

    python scripts/compile_gate.py            # all variants
    python scripts/compile_gate.py GMDEPTH_SCALE1   # subset

Doubles as the variant-forward half of the driver-cache warmer
(scripts/warm_driver_cache.sh runs it as step 0).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from unimatch_tpu.utils.jax_cache import enable_compilation_cache  # noqa: E402

enable_compilation_cache()

VARIANTS = (
    ("GMFLOW_SCALE2_REGREFINE6", (448, 1024)),
    ("GMSTEREO_SCALE2_REGREFINE3", (384, 1248)),
    ("GMFLOW_SCALE1", (448, 1024)),
    ("GMFLOW_SCALE2", (448, 1024)),
    ("GMDEPTH_SCALE1", (480, 640)),
)


def variant_forward(cfg_name, shape, bs=1):
    from unimatch_tpu import config as cfgs
    from unimatch_tpu.models.unimatch import UniMatch

    cfg, infer = getattr(cfgs, cfg_name)
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(bs, *shape, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(bs, *shape, 3) * 255, jnp.bfloat16)
    kw = {}
    if cfg.task == "depth":
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


def main(names):
    failures = []
    for cfg_name, shape in VARIANTS:
        if names and cfg_name not in names:
            continue
        t0 = time.time()
        try:
            fwd, params, a, b = variant_forward(cfg_name, shape)
            out = jax.jit(fwd)(params, a, b)
            jax.block_until_ready(out)
            finite = bool(np.isfinite(np.asarray(out, np.float32)).all())
            status = "ok" if finite else "NON-FINITE OUTPUT"
            if not finite:
                failures.append(cfg_name)
        except Exception as e:  # noqa: BLE001
            status = f"FAIL {e!r:.300}"
            failures.append(cfg_name)
        print(f"[compile_gate] {cfg_name} {shape}: {status} "
              f"({time.time() - t0:.0f}s)", flush=True)
    if failures:
        print(f"[compile_gate] FAILED: {failures}", flush=True)
        return 1
    print("[compile_gate] all variants compile + run with default-on kernels",
          flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main(set(sys.argv[1:])))
