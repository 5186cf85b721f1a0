#!/usr/bin/env python
"""Stereo driver: train (default) / --eval / --submission / --inference_dir.

CLI-compatible with the reference's main_stereo.py.
"""

import argparse

from unimatch_tpu.cli import add_common_args, build_model_and_infer, train_loop


def get_args_parser():
    parser = argparse.ArgumentParser("unimatch_tpu stereo")
    add_common_args(parser)
    parser.add_argument("--stage", default="sceneflow", type=str)
    parser.add_argument("--task", default="stereo", choices=["stereo"], type=str)
    parser.add_argument("--img_height", default=384, type=int)
    parser.add_argument("--img_width", default=768, type=int)
    parser.add_argument("--val_dataset", default=["kitti15"], type=str, nargs="+")
    parser.add_argument("--max_disp", default=400, type=int)
    parser.add_argument("--resume_exclude_upsampler", action="store_true")
    parser.add_argument("--submission", action="store_true")
    parser.add_argument("--eth_submission_mode", default="train", type=str)
    parser.add_argument("--middlebury_submission_mode", default="training", type=str)
    parser.add_argument("--middlebury_resolution", default="H", type=str)
    parser.add_argument("--output_path", default="output", type=str)
    parser.add_argument("--inference_dir", default=None, type=str)
    parser.add_argument("--inference_dir_left", default=None, type=str)
    parser.add_argument("--inference_dir_right", default=None, type=str)
    parser.add_argument("--pred_bidir_disp", action="store_true")
    parser.add_argument("--pred_right_disp", action="store_true")
    parser.add_argument("--save_pfm_disp", action="store_true")
    parser.add_argument("--save_vis_disp", action="store_true")
    parser.add_argument("--save_dir", default=None, type=str)
    return parser


def _load_params(args, model, infer):
    import jax
    import jax.numpy as jnp

    from unimatch_tpu import checkpoint as ckpt

    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img, infer=infer)
    if args.resume:
        loaded = ckpt.load_any_params(args.resume)
        merged = ckpt.merge_params(
            jax.device_get(params["params"]), loaded.get("params", loaded),
            strict=args.strict_resume,
            exclude_upsampler=args.resume_exclude_upsampler,
        )
        params = {"params": jax.tree.map(jnp.asarray, merged)}
    if args.bf16:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    return params


def main(args):
    from unimatch_tpu.cli import maybe_sequence_parallel

    with maybe_sequence_parallel(args):
        return _main_modes(args)


def _main_modes(args):
    if args.inference_dir or args.inference_dir_left:
        from unimatch_tpu.inference import inference_stereo

        model, infer = build_model_and_infer(args, "stereo")
        params = _load_params(args, model, infer)
        inference_stereo(
            model, params, infer,
            inference_dir=args.inference_dir,
            inference_dir_left=args.inference_dir_left,
            inference_dir_right=args.inference_dir_right,
            output_path=args.output_path,
            padding_factor=args.padding_factor,
            inference_size=tuple(args.inference_size) if args.inference_size else None,
            pred_bidir_disp=args.pred_bidir_disp,
            pred_right_disp=args.pred_right_disp,
            save_pfm_disp=args.save_pfm_disp,
        )
        return

    if args.eval or args.submission:
        from unimatch_tpu.evaluate import stereo as E

        model, infer = build_model_and_infer(args, "stereo")
        params = _load_params(args, model, infer)
        size = tuple(args.inference_size) if args.inference_size else None
        kw = dict(padding_factor=args.padding_factor, inference_size=size)
        if not args.submission:
            kw["count_time"] = args.count_time
        results = {}
        for val in args.val_dataset:
            if args.submission:
                if val == "kitti15":
                    E.create_kitti_submission(model, params, infer,
                                              root=f"{args.datasets_root}/KITTI/stereo/kitti_2015",
                                              output_path=args.output_path,
                                              save_vis_disp=args.save_vis_disp, **kw)
                elif val == "eth3d":
                    E.create_eth3d_submission(model, params, infer,
                                              root=f"{args.datasets_root}/ETH3D",
                                              output_path=args.output_path,
                                              save_vis_disp=args.save_vis_disp, **kw)
                elif val == "middlebury":
                    E.create_middlebury_submission(
                        model, params, infer,
                        root=f"{args.datasets_root}/Middlebury/MiddEval3",
                        output_path=args.output_path,
                        save_vis_disp=args.save_vis_disp,
                        resolution=args.middlebury_resolution, **kw)
                continue
            if val == "things":
                results.update(E.validate_things(model, params, infer,
                                                 root=f"{args.datasets_root}/FlyingThings3D", **kw))
            elif val == "kitti15":
                results.update(E.validate_kitti15(model, params, infer,
                                                  root=f"{args.datasets_root}/KITTI/stereo/kitti_2015", **kw))
            elif val == "eth3d":
                results.update(E.validate_eth3d(model, params, infer,
                                                root=f"{args.datasets_root}/ETH3D", **kw))
            elif val == "middlebury":
                results.update(E.validate_middlebury(model, params, infer,
                                                     root=f"{args.datasets_root}/Middlebury/MiddEval3",
                                                     resolution=args.middlebury_resolution, **kw))
        for k, v in results.items():
            print(f"{k}: {v:.4f}")
        return

    # train
    import numpy as np

    def build_dataset_fn(a):
        from unimatch_tpu.data.stereo_datasets import build_dataset

        return build_dataset(a.stage, a.img_height, a.img_width, root_prefix=a.datasets_root)

    def example_batch_fn(a):
        h, w = a.img_height, a.img_width
        return {
            "img0": np.zeros((1, h, w, 3), np.float32),
            "img1": np.zeros((1, h, w, 3), np.float32),
            "disp_gt": np.zeros((1, h, w), np.float32),
            "valid": np.ones((1, h, w), np.float32),
        }

    def validate_fn(a, model, params, infer):
        """Periodic in-training validation (reference main_stereo.py:482-)."""
        from unimatch_tpu.evaluate import stereo as E

        size = tuple(a.inference_size) if a.inference_size else None
        kw = dict(padding_factor=a.padding_factor, inference_size=size)
        results = {}
        for val in a.val_dataset:
            try:
                if val == "things":
                    results.update(E.validate_things(
                        model, params, infer,
                        root=f"{a.datasets_root}/FlyingThings3D", **kw))
                elif val == "kitti15":
                    results.update(E.validate_kitti15(
                        model, params, infer,
                        root=f"{a.datasets_root}/KITTI/stereo/kitti_2015", **kw))
                elif val == "eth3d":
                    results.update(E.validate_eth3d(
                        model, params, infer, root=f"{a.datasets_root}/ETH3D", **kw))
                elif val == "middlebury":
                    results.update(E.validate_middlebury(
                        model, params, infer,
                        root=f"{a.datasets_root}/Middlebury/MiddEval3",
                        resolution=a.middlebury_resolution, **kw))
            except FileNotFoundError:
                pass  # validation dataset not present on this host
        return results

    train_loop(args, "stereo", build_dataset_fn, example_batch_fn, validate_fn=validate_fn)


if __name__ == "__main__":
    main(get_args_parser().parse_args())


def cli_entry():
    """Console-script entry point (pyproject.toml [project.scripts])."""
    main(get_args_parser().parse_args())
