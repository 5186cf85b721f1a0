#!/usr/bin/env bash
# DepthSplat depth demo on the bundled ScanNet frames.
python main_depth.py \
  --depthsplat_depth \
  --inference_dir demo/depth-scannet \
  --resume pretrained/depthsplat-depth-small.pth \
  --output_path output/depthsplat-scannet \
  --num_scales 1 --attn_splits_list 2 --prop_radius_list -1 \
  --padding_factor 16 "$@"
