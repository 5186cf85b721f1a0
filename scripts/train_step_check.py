"""On-hardware training-step evidence (VERDICT round-2, item 4).

Runs ONE flagship-config train step (GMFlow-scale2-regrefine6, tiny shapes,
bs=2, bf16 params) and records loss, gradient finiteness, and the global
gradient norm. Run the CPU leg first (pure-jnp reference paths), then the TPU
leg (which exercises the Pallas kernels' custom_vjp backward paths on the
real chip) — the TPU leg loads the CPU leg's saved grads and reports the
maximum deviation:

    python scripts/train_step_check.py cpu
    python scripts/train_step_check.py tpu

Commit the printed JSON to docs/TPU_TRAIN_STEP.md. The train step mirrors the
reference loop semantics (main_flow.py:409-601): forward with deep
supervision, exponentially-weighted multi-prediction L1 loss, AdamW update.
"""

import json
import sys

MODE = sys.argv[1] if len(sys.argv) > 1 else "cpu"

import jax

if MODE == "cpu":
    jax.config.update("jax_platforms", "cpu")

import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp
import optax

from unimatch_tpu import config as cfgs
from unimatch_tpu.losses.flow import flow_loss
from unimatch_tpu.models.unimatch import UniMatch

OUT = "/tmp/train_step_%s.npz"
H, W, B = 64, 96, 2


def main():
    cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    rng = np.random.RandomState(7)
    img0 = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.float32))
    img1 = jnp.asarray((rng.rand(B, H, W, 3) * 255).astype(np.float32))
    gt = jnp.asarray((rng.randn(B, H, W, 2) * 5).astype(np.float32))
    valid = jnp.ones((B, H, W), jnp.float32)

    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if x.dtype == jnp.float32 else x, params
    )
    img0 = img0.astype(jnp.bfloat16)
    img1 = img1.astype(jnp.bfloat16)

    opt = optax.adamw(1e-4, weight_decay=1e-4)
    opt_state = opt.init(params)

    def loss_fn(p):
        preds = model.apply(p, img0, img1, infer=infer, training=True)["flow_preds"]
        loss, metrics = flow_loss(preds, gt, valid)
        return loss, metrics

    @jax.jit
    def step(p, s):
        (loss, metrics), grads = jax.value_and_grad(loss_fn, has_aux=True)(p)
        gnorm = optax.global_norm(grads)
        updates, s = opt.update(grads, s, p)
        p = optax.apply_updates(p, updates)
        return p, s, loss, metrics, grads, gnorm

    new_params, _, loss, metrics, grads, gnorm = step(params, opt_state)

    flat = {
        "/".join(map(str, path)): np.asarray(g, np.float32)
        for path, g in jax.tree_util.tree_leaves_with_path(grads)
    }
    finite = all(np.isfinite(v).all() for v in flat.values())
    record = {
        "mode": MODE,
        "backend": jax.default_backend(),
        "device": str(jax.devices()[0]),
        "config": "gmflow_scale2_regrefine6",
        "shape": [B, H, W],
        "dtype": "bfloat16 params/activations",
        "loss": float(loss),
        "epe": float(metrics["epe"]),
        "grad_global_norm": float(gnorm),
        "grads_finite": bool(finite),
        "params_updated": bool(
            any(
                not np.array_equal(np.asarray(a, np.float32), np.asarray(b, np.float32))
                for a, b in zip(jax.tree.leaves(params), jax.tree.leaves(new_params))
            )
        ),
    }

    np.savez(OUT % MODE, **flat, __loss=np.float32(loss))

    if MODE == "tpu" and os.path.exists(OUT % "cpu"):
        ref = np.load(OUT % "cpu")
        devs = []
        for k, v in flat.items():
            r = ref[k]
            scale = max(np.abs(r).max(), 1e-6)
            devs.append(np.abs(v - r).max() / scale)
        record["max_rel_grad_dev_vs_cpu"] = float(max(devs))
        record["median_rel_grad_dev_vs_cpu"] = float(np.median(devs))
        record["cpu_loss"] = float(ref["__loss"])

    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
