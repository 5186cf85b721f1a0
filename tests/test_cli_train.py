"""End-to-end CLI training smoke test: a few optimizer steps on synthetic data,
checkpoint write + resume (CPU)."""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from test_data_pipeline import _make_sintel


def _flow_args(tmp_path, num_steps):
    import main_flow

    parser = main_flow.get_args_parser()
    return parser.parse_args(
        [
            "--stage", "sintel_ft",
            "--datasets_root", str(tmp_path / "datasets"),
            "--checkpoint_dir", str(tmp_path / "ckpt"),
            "--image_size", "48", "64",
            "--batch_size", "2",
            "--num_workers", "1",
            "--num_steps", str(num_steps),
            "--num_scales", "1",
            "--attn_splits_list", "2",
            "--corr_radius_list", "-1",
            "--prop_radius_list", "-1",
            "--save_latest_ckpt_freq", "2",
            "--save_ckpt_freq", "2",
            "--summary_freq", "2",
            "--lr", "1e-4",
        ]
    )


def test_main_flow_train_and_resume(tmp_path):
    import main_flow

    root = str(tmp_path / "datasets" / "Sintel")
    _make_sintel(root, scenes=2, frames=3, h=56, w=72)
    # sintel_ft mixes clean + final passes
    import shutil

    shutil.copytree(os.path.join(root, "training", "clean"),
                    os.path.join(root, "training", "final"))

    main_flow.main(_flow_args(tmp_path, num_steps=2))

    ckpt_dir = tmp_path / "ckpt"
    assert (ckpt_dir / "args.json").exists()
    assert (ckpt_dir / "checkpoint_latest").exists()
    assert (ckpt_dir / "step_000002").exists()
    assert any(p.name.endswith("_parameters") for p in ckpt_dir.iterdir())

    # resume continues from step 2 to step 4
    args = _flow_args(tmp_path, num_steps=4)
    args.resume = str(ckpt_dir / "checkpoint_latest")
    main_flow.main(args)
    assert (ckpt_dir / "step_000004").exists()


def test_cli_parsers_accept_reference_flags():
    """The reference's canonical flag sets parse cleanly."""
    import main_depth
    import main_stereo
    import main_flow

    main_flow.get_args_parser().parse_args(
        "--num_scales 2 --upsample_factor 4 --attn_splits_list 2 8 "
        "--corr_radius_list -1 4 --prop_radius_list -1 1 --reg_refine "
        "--num_reg_refine 6 --padding_factor 32 --with_speed_metric".split()
    )
    # flags used by the reference demo/eval scripts (gmflow_demo.sh etc.)
    args = main_flow.get_args_parser().parse_args(
        "--inference_dir demo --pred_bidir_flow --fwd_bwd_check --pred_bwd_flow "
        "--save_flo_flow --save_video --concat_flow_img --save_eval_to_file "
        "--evaluate_matched_unmatched --val_things_clean_only --gamma 0.9 "
        "--task flow --launcher pytorch --local_rank 0 --distributed".split()
    )
    assert args.fwd_bwd_check and args.pred_bwd_flow and args.gamma == 0.9
    main_stereo.get_args_parser().parse_args(
        "--attn_type self_swin2d_cross_swin1d --num_scales 2 --upsample_factor 4 "
        "--attn_splits_list 2 8 --corr_radius_list -1 4 --prop_radius_list -1 1 "
        "--reg_refine --num_reg_refine 3 --middlebury_resolution F "
        "--save_vis_disp --save_dir out --task stereo".split()
    )
    main_depth.get_args_parser().parse_args(
        "--num_scales 1 --attn_splits_list 2 --prop_radius_list -1 "
        "--reg_refine --num_reg_refine 1 --min_depth 0.5 --max_depth 10".split()
    )
    # reference main_depth.py flag names: --dataset (not --stage), --workers,
    # --demon_split, --save_vis_depth, --depth_grad_loss_weight
    args = main_depth.get_args_parser().parse_args(
        "--dataset demon --workers 2 --demon_split sun3d --save_vis_depth "
        "--save_dir out --depth_loss_weight 20 --depth_grad_loss_weight 0".split()
    )
    assert args.stage == "demon" and args.num_workers == 2
    assert args.demon_split == "sun3d" and args.depth_grad_loss_weight == 0
