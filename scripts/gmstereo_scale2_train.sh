#!/usr/bin/env bash
# GMStereo scale2 (no regression refinement), sceneflow -> vkitti2 -> kitti15mix.
set -e
COMMON="--num_scales 2 --upsample_factor 4 --attn_type self_swin2d_cross_swin1d \
--attn_splits_list 2 8 --corr_radius_list -1 4 --prop_radius_list -1 1 --padding_factor 32"

CHECKPOINT_DIR=checkpoints_stereo/sceneflow-gmstereo-scale2
mkdir -p ${CHECKPOINT_DIR}
python main_stereo.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/things-gmflow-scale2/step_200000 --no_resume_optimizer --resume_exclude_upsampler \
  --stage sceneflow --batch_size 16 --lr 4e-4 --img_height 384 --img_width 768 \
  --num_steps 100000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_stereo/vkitti2-gmstereo-scale2
mkdir -p ${CHECKPOINT_DIR}
python main_stereo.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_stereo/sceneflow-gmstereo-scale2/step_100000 --no_resume_optimizer \
  --stage vkitti2 --batch_size 8 --lr 2e-4 --img_height 320 --img_width 832 \
  --num_steps 30000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_stereo/kitti-gmstereo-scale2
mkdir -p ${CHECKPOINT_DIR}
python main_stereo.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_stereo/vkitti2-gmstereo-scale2/step_030000 --no_resume_optimizer \
  --stage kitti15mix --batch_size 8 --lr 2e-4 --img_height 320 --img_width 1152 \
  --num_steps 10000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log
