#!/usr/bin/env bash
# GMStereo flagship: scale2 + 3 regression refinements,
# sceneflow -> (vkitti2 -> kitti15mix | middlebury | eth3d) curricula.
set -e
COMMON="--upsample_factor 4 --num_scales 2 --attn_type self_swin2d_cross_swin1d \
--attn_splits_list 2 8 --corr_radius_list -1 4 --prop_radius_list -1 1 \
--reg_refine --num_reg_refine 3 --padding_factor 32"

CHECKPOINT_DIR=checkpoints_stereo/sceneflow-gmstereo-scale2-regrefine3
mkdir -p ${CHECKPOINT_DIR}
python main_stereo.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_flow/things-gmflow-scale2-regrefine6/step_200000 \
  --no_resume_optimizer --resume_exclude_upsampler \
  --stage sceneflow --batch_size 16 --lr 4e-4 --img_height 384 --img_width 768 \
  --num_steps 100000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_stereo/middlebury-gmstereo-scale2-regrefine3
mkdir -p ${CHECKPOINT_DIR}
python main_stereo.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_stereo/sceneflow-gmstereo-scale2-regrefine3/step_100000 --no_resume_optimizer \
  --stage middlebury --batch_size 8 --lr 2e-4 --img_height 480 --img_width 640 \
  --num_steps 100000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log

CHECKPOINT_DIR=checkpoints_stereo/middlebury_ft-gmstereo-scale2-regrefine3
mkdir -p ${CHECKPOINT_DIR}
python main_stereo.py ${COMMON} --checkpoint_dir ${CHECKPOINT_DIR} \
  --resume checkpoints_stereo/middlebury-gmstereo-scale2-regrefine3/step_100000 --no_resume_optimizer \
  --stage middlebury_ft --batch_size 4 --lr 1e-4 --img_height 768 --img_width 1024 \
  --num_steps 50000 2>&1 | tee -a ${CHECKPOINT_DIR}/train.log
