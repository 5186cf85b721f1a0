"""Stage-cost attribution by ablation (in-situ, not isolated).

Isolated stage timings carry 1-3 ms dispatch overhead each and miss
cross-op fusion, so they cannot be summed to 70 ms. This batch compiles
full flagship forwards with one knob changed at a time; the deltas are the
true in-situ costs:

  refine_iters — num_reg_refine 6 vs 1: 5x (lookup + update net)
  no_refine    — regrefine6 model vs plain scale2 weights-compatible pass:
                 full refine block incl. volume build (approximated by
                 num_reg_refine=1 vs scale2 alone not being comparable;
                 instead we report scale2 config separately)

Emits JSON lines to /tmp/tpu_r3g_results.jsonl.
"""

import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

OUT = "/tmp/tpu_r3g_results.jsonl"


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
    cfg, infer6 = cfgs.GMFLOW_SCALE2_REGREFINE6
    model = UniMatch(config=cfg)
    img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
    params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer6)
    params = jax.tree.map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params
    )

    variants = {
        "rr6": infer6,
        "rr1": dataclasses.replace(infer6, num_reg_refine=1),
        "rr2": dataclasses.replace(infer6, num_reg_refine=2),
    }
    fns = {}
    for name, inf in variants.items():
        def f(p, a, b, inf=inf):
            return model.apply(p, a, b, infer=inf)["flow_preds"][-1]

        f.__name__ = "fwd_" + name
        fns[name] = f

    res = {}
    try:
        for rep in range(3):
            for name, f in fns.items():
                res.setdefault(name, []).append(round(time_chained(
                    f, params, img0, img1, n=12,
                    min_warmup_s=8 if rep == 0 and name == "rr6" else 0) * 1e3, 1))
        # rr1 uses the direct-gather path (volume needs >= 2 iters), so the
        # clean per-iteration (lookup + update net) delta is (rr6 - rr2)/4
        per_iter = (min(res["rr6"]) - min(res["rr2"])) / 4.0
        emit(part="refine_ablation", **res,
             per_refine_iter_ms=round(per_iter, 2),
             refine6_loop_ms=round(6 * per_iter, 1),
             non_refine_base_ms=round(min(res["rr2"]) - 2 * per_iter, 1))
    except Exception as e:  # noqa: BLE001
        traceback.print_exc()
        emit(part="refine_ablation", status="error", error=repr(e)[:400])
    emit(part="session", status="complete", end=time.strftime("%H:%M:%S"))


if __name__ == "__main__":
    main()
