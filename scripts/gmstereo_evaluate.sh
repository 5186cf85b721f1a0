#!/usr/bin/env bash
python main_stereo.py --eval \
  --resume pretrained/gmstereo-scale2-regrefine3-resumeflowthings-middleburyfthighres.pth \
  --val_dataset middlebury --middlebury_resolution H \
  --upsample_factor 4 --num_scales 2 --attn_type self_swin2d_cross_swin1d \
  --attn_splits_list 2 8 --corr_radius_list -1 4 --prop_radius_list -1 1 \
  --reg_refine --num_reg_refine 3 --padding_factor 32 "$@"
