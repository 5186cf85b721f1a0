#!/usr/bin/env bash
# GMFlow scale1 (global matching at 1/8 only), chairs -> things curriculum.
set -e
COMMON="--num_scales 1 --attn_splits_list 2 --corr_radius_list -1 --prop_radius_list -1 \
--padding_factor 16 --with_speed_metric"

CHECKPOINT_DIR=checkpoints_flow/chairs-gmflow-scale1
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --stage chairs --batch_size 16 --lr 4e-4 --image_size 384 512 --num_steps 100000 \
  2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_flow/things-gmflow-scale1
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/chairs-gmflow-scale1/step_100000 --no_resume_optimizer \
  --stage things --batch_size 8 --lr 2e-4 --image_size 384 768 --num_steps 200000 \
  2>&1 | tee -a ${CHECKPOINT_DIR}/train.log
