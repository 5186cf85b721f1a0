#!/bin/bash
# Round-3c TPU batch: remaining legs after the 3b stage A/Bs settled the
# fuse defaults (both OFF — see docs/PERF_NOTES.md). Refine-net XLA timing,
# on-chip train-step evidence (VERDICT r2 item 4), flagship bench.
set -x
cd /root/repo
export UNIMATCH_FUSE_CONV=0
export UNIMATCH_FUSE_IN=0
python - <<'EOF' 2>&1 | tee /tmp/tpu_r3c_refine.log
import json, time, os, sys
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from unimatch_tpu.utils.benchmark import time_chained
from unimatch_tpu.models.reg_refine import BasicUpdateBlock

RNG = np.random.RandomState(0)
bf = lambda *s: jnp.asarray(RNG.randn(*s), jnp.bfloat16)
blk = BasicUpdateBlock(downsample_factor=4, flow_dim=2, bilinear_up=False)
net, inp = bf(1, 112, 256, 128), bf(1, 112, 256, 128)
corr, flow = bf(1, 112, 256, 81), bf(1, 112, 256, 2)
params = blk.init(jax.random.PRNGKey(0), net, inp, corr, flow)
params = jax.tree.map(lambda a: a.astype(jnp.bfloat16), params)

def fwd1(p, net, inp, corr, flow):
    return blk.apply(p, net, inp, corr, flow)

def fwd6(p, net, inp, corr, flow):
    f, mask = flow, None
    for _ in range(6):
        _, mask, delta = blk.apply(p, net, inp, corr, f)
        f = f + delta
    return f, mask.astype(jnp.float32).sum()

res = {}
for rep in range(2):
    res.setdefault("xla_x1", []).append(round(time_chained(
        fwd1, params, net, inp, corr, flow, n=20,
        min_warmup_s=5 if rep == 0 else 0) * 1e3, 2))
    res.setdefault("xla_x6", []).append(round(time_chained(
        fwd6, params, net, inp, corr, flow, n=10, warmup=2) * 1e3, 2))
print(json.dumps({"part": "refine_net_xla", **res}), flush=True)
with open("/tmp/tpu_r3b_results.jsonl", "a") as f:
    f.write(json.dumps({"part": "refine_net_xla", **res}) + "\n")
EOF
python scripts/train_step_check.py tpu 2>&1 | tee /tmp/train_step_tpu.log
python bench.py 2>&1 | tee /tmp/bench_r3c.log
echo BATCH_DONE
