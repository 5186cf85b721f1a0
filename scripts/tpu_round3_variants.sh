#!/bin/bash
# Round-3 per-variant bench re-measurement (VERDICT r2 item 8): all five
# BENCH_CONFIGs with the hardened chunked methodology, one sequential TPU
# session so nothing contends for the single host core. Flagship last so its
# number also lands in /tmp/bench_flagship.log for BENCH_r03.
set -x
cd /root/repo
for cfg in gmflow_scale1 gmflow_scale2 gmdepth_scale1 gmstereo_scale2_regrefine3 gmflow_scale2_regrefine6; do
  BENCH_CONFIG=$cfg python bench.py 2>&1 | tee /tmp/bench_${cfg}.log
done
echo VARIANTS_DONE
