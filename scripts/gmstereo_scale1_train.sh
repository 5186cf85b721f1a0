#!/usr/bin/env bash
set -e
python main_stereo.py \
  --checkpoint_dir checkpoints_stereo/sceneflow-gmstereo-scale1 \
  --stage sceneflow --batch_size 16 --lr 4e-4 --img_height 384 --img_width 768 \
  --num_scales 1 --attn_type self_swin2d_cross_1d \
  --attn_splits_list 2 --corr_radius_list -1 --prop_radius_list -1 \
  --padding_factor 16 --num_steps 100000 "$@"
