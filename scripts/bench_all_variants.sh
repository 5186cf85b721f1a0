#!/bin/bash
# Re-measure every BENCH_CONFIG variant with the current defaults (VERDICT
# round-3 item 8: every variant >= 2x A100 in a recorded A/B). One bench.py
# invocation per variant; each prints its JSON line and warms the committed
# .jax_cache. Run with nothing else on the chip or the host.
set -e
cd "$(dirname "$0")/.."

OUT=${1:-docs/artifacts_round4_variants.jsonl}
for cfg in gmflow_scale2_regrefine6 gmflow_scale1 gmflow_scale2 \
           gmstereo_scale2_regrefine3 gmdepth_scale1; do
  echo "== $cfg =="
  BENCH_CONFIG=$cfg timeout 3600 python bench.py | tee -a "$OUT"
done
echo "wrote $OUT"
