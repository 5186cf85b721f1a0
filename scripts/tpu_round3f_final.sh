#!/bin/bash
# Round-3f final TPU batch: volume-build form A/B in the full model, then
# the per-variant bench re-measurement (VERDICT r2 item 8) with the settled
# kernel defaults (GRU + FFN fused). One sequential session.
set -x
cd /root/repo
python - <<'EOF' 2>&1 | tee /tmp/tpu_r3f_volab.log
import json, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from unimatch_tpu.utils.benchmark import time_chained
from unimatch_tpu import config as cfgs
from unimatch_tpu.models.unimatch import UniMatch

cfg, infer = cfgs.GMFLOW_SCALE2_REGREFINE6
model = UniMatch(config=cfg)
img0 = jnp.asarray(np.random.RandomState(1).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
img1 = jnp.asarray(np.random.RandomState(2).rand(1, 448, 1024, 3) * 255, jnp.bfloat16)
params = model.init(jax.random.PRNGKey(0), img0, img1, infer=infer)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a, params)

def fp(p, a, b):
    return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

def fx(p, a, b):
    return model.apply(p, a, b, infer=infer)["flow_preds"][-1]

res = {}
for rep in range(3):
    os.environ["UNIMATCH_VOLUME_BUILD"] = "pallas"
    res.setdefault("pallas_ms", []).append(round(time_chained(
        fp, params, img0, img1, n=12, min_warmup_s=8 if rep == 0 else 0) * 1e3, 1))
    os.environ["UNIMATCH_VOLUME_BUILD"] = "xla"
    res.setdefault("xla_ms", []).append(round(time_chained(
        fx, params, img0, img1, n=12, warmup=1) * 1e3, 1))
os.environ.pop("UNIMATCH_VOLUME_BUILD", None)
line = json.dumps({"part": "volume_build_ab", **res})
print(line, flush=True)
with open("/tmp/tpu_r3f_results.jsonl", "a") as f:
    f.write(line + "\n")
EOF
bash scripts/tpu_round3_variants.sh
echo R3F_DONE
