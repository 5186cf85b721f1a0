#!/usr/bin/env bash
# GMFlow flagship: hierarchical 1/8 + 1/4 matching with 6 local regression
# refinements. Multi-stage curriculum matching the reference recipe
# (scripts/gmflow_scale2_regrefine6_train.sh); data parallelism comes from the
# jax.sharding mesh over all visible TPU chips — no launcher needed.

set -e

COMMON="--upsample_factor 4 --num_scales 2 --attn_splits_list 2 8 \
--corr_radius_list -1 4 --prop_radius_list -1 1 --reg_refine --num_reg_refine 6 \
--padding_factor 32 --with_speed_metric --val_freq 10000 --save_ckpt_freq 10000"

# stage 1: chairs (warm start from a scale2 checkpoint if available)
CHECKPOINT_DIR=checkpoints_flow/chairs-gmflow-scale2-regrefine6
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} \
  --checkpoint_dir ${CHECKPOINT_DIR} \
  --stage chairs --batch_size 16 --lr 4e-4 --image_size 384 512 \
  --num_steps 100000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

# stage 2: things
CHECKPOINT_DIR=checkpoints_flow/things-gmflow-scale2-regrefine6
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} \
  --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/chairs-gmflow-scale2-regrefine6/step_100000 --no_resume_optimizer \
  --stage things --batch_size 8 --lr 2e-4 --image_size 384 768 \
  --num_steps 200000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

# stage 3: sintel mix
CHECKPOINT_DIR=checkpoints_flow/sintel-gmflow-scale2-regrefine6
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} \
  --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/things-gmflow-scale2-regrefine6/step_200000 --no_resume_optimizer \
  --stage sintel --batch_size 8 --lr 2e-4 --image_size 320 896 \
  --num_steps 200000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

# stage 4: vkitti2 -> kitti_mix for KITTI submission
CHECKPOINT_DIR=checkpoints_flow/vkitti2-gmflow-scale2-regrefine6
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} \
  --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/sintel-gmflow-scale2-regrefine6/step_200000 --no_resume_optimizer \
  --stage vkitti2 --batch_size 8 --lr 2e-4 --image_size 320 832 \
  --num_steps 40000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_flow/kitti-gmflow-scale2-regrefine6
mkdir -p ${CHECKPOINT_DIR}
python main_flow.py ${COMMON} \
  --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/vkitti2-gmflow-scale2-regrefine6/step_040000 --no_resume_optimizer \
  --stage kitti_mix --batch_size 8 --lr 2e-4 --image_size 320 1152 \
  --num_steps 30000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log
