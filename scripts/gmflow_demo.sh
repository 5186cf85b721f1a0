#!/usr/bin/env bash
# Flow demo on the bundled DAVIS frames.
python main_flow.py \
  --inference_dir demo/flow-davis \
  --resume pretrained/gmflow-scale2-regrefine6-mixdata.pth \
  --output_path output/gmflow-davis \
  --upsample_factor 4 --num_scales 2 \
  --attn_splits_list 2 8 --corr_radius_list -1 4 --prop_radius_list -1 1 \
  --reg_refine --num_reg_refine 6 --padding_factor 32 "$@"
