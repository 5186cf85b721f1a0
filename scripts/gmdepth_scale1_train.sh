#!/usr/bin/env bash
set -e
python main_depth.py \
  --checkpoint_dir checkpoints_depth/scannet-gmdepth-scale1 \
  --resume checkpoints_flow/things-gmflow-scale1/step_200000 --no_resume_optimizer \
  --stage scannet --batch_size 64 --lr 4e-4 --image_size 480 640 \
  --num_scales 1 --attn_splits_list 2 --prop_radius_list -1 \
  --padding_factor 16 --num_steps 100000 "$@"
