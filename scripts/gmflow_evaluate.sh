#!/usr/bin/env bash
# Evaluate flow checkpoints (converted .pth or orbax dirs work for --resume).
python main_flow.py --eval \
  --resume pretrained/gmflow-scale2-regrefine6-mixdata.pth \
  --val_dataset sintel \
  --upsample_factor 4 --num_scales 2 \
  --attn_splits_list 2 8 --corr_radius_list -1 4 --prop_radius_list -1 1 \
  --reg_refine --num_reg_refine 6 --padding_factor 32 --with_speed_metric "$@"
