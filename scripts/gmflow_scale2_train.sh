#!/usr/bin/env bash
# GMFlow scale2 (hierarchical 1/8 + 1/4 matching, no regression refinement).
set -e
COMMON="--num_scales 2 --upsample_factor 4 --attn_splits_list 2 8 \
--corr_radius_list -1 4 --prop_radius_list -1 1 --padding_factor 32 --with_speed_metric"

CHECKPOINT_DIR=checkpoints_flow/chairs-gmflow-scale2
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --stage chairs --batch_size 16 --lr 4e-4 --image_size 384 512 --num_steps 100000 \
  2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_flow/things-gmflow-scale2
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/chairs-gmflow-scale2/step_100000 --no_resume_optimizer \
  --stage things --batch_size 8 --lr 2e-4 --image_size 384 768 --num_steps 200000 \
  2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_flow/sintel-gmflow-scale2
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/things-gmflow-scale2/step_200000 --no_resume_optimizer \
  --stage sintel --batch_size 8 --lr 2e-4 --image_size 320 896 --num_steps 200000 \
  2>&1 | tee -a ${CHECKPOINT_DIR}/train.log
