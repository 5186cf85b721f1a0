#!/usr/bin/env bash
python main_depth.py --eval \
  --resume pretrained/gmdepth-scale1-regrefine1-resumeflowthings-scannet.pth \
  --val_dataset scannet \
  --num_scales 1 --attn_splits_list 2 --prop_radius_list -1 \
  --reg_refine --num_reg_refine 1 --padding_factor 16 "$@"
