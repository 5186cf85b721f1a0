#!/bin/bash
# Round-3b TPU batch: stage breakdown + fused-conv/IN A/B, then the
# training-step evidence leg (VERDICT r2 item 4), then a flagship bench
# read. ONE sequential session so nothing contends for the single host core.
set -x
cd /root/repo
python scripts/tpu_round3b_stages.py 2>&1 | tee /tmp/tpu_r3b_stdout.log
python scripts/train_step_check.py tpu 2>&1 | tee /tmp/train_step_tpu.log
python bench.py 2>&1 | tee /tmp/bench_r3b.log
echo BATCH_DONE
