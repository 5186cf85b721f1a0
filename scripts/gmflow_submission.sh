#!/usr/bin/env bash
# Generate Sintel / KITTI benchmark-server submissions.
python main_flow.py --submission \
  --resume pretrained/gmflow-scale2-regrefine6-sintelft.pth \
  --val_dataset sintel --output_path sintel_submission \
  --upsample_factor 4 --num_scales 2 \
  --attn_splits_list 2 8 --corr_radius_list -1 4 --prop_radius_list -1 1 \
  --reg_refine --num_reg_refine 6 --padding_factor 32 "$@"
