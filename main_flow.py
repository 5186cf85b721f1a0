#!/usr/bin/env python
"""Optical-flow driver: train (default) / --eval / --submission / --inference_dir.

CLI-compatible with the reference's main_flow.py so the scripts/*.sh
hyper-parameters port directly.
"""

import argparse

from unimatch_tpu.cli import add_common_args, build_model_and_infer, train_loop


def get_args_parser():
    parser = argparse.ArgumentParser("unimatch_tpu flow")
    add_common_args(parser)
    parser.add_argument("--stage", default="chairs", type=str)
    parser.add_argument("--task", default="flow", choices=["flow"], type=str)
    parser.add_argument("--image_size", default=[384, 512], type=int, nargs="+")
    parser.add_argument("--val_dataset", default=["chairs"], type=str, nargs="+")
    parser.add_argument("--max_flow", default=400, type=int)
    parser.add_argument("--gamma", default=0.9, type=float,
                        help="exponential loss weighting of the sequence predictions")
    parser.add_argument("--submission", action="store_true")
    parser.add_argument("--output_path", default="output", type=str)
    parser.add_argument("--save_vis_flow", action="store_true")
    parser.add_argument("--no_save_flo", action="store_true")
    parser.add_argument("--inference_dir", default=None, type=str)
    parser.add_argument("--inference_video", default=None, type=str)
    parser.add_argument("--pred_bidir_flow", action="store_true")
    parser.add_argument("--pred_bwd_flow", action="store_true")
    parser.add_argument("--fwd_bwd_check", action="store_true")
    parser.add_argument("--save_flo_flow", action="store_true")
    parser.add_argument("--save_video", action="store_true")
    parser.add_argument("--concat_flow_img", action="store_true")
    parser.add_argument("--with_speed_metric", action="store_true")
    parser.add_argument("--save_eval_to_file", action="store_true")
    parser.add_argument("--evaluate_matched_unmatched", action="store_true")
    parser.add_argument("--val_things_clean_only", action="store_true")
    return parser


def _load_params(args, model, infer):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unimatch_tpu import checkpoint as ckpt

    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    params = model.init(jax.random.PRNGKey(0), img, img, infer=infer)
    if args.resume:
        loaded = ckpt.load_any_params(args.resume)
        merged = ckpt.merge_params(
            jax.device_get(params["params"]), loaded.get("params", loaded),
            strict=args.strict_resume,
        )
        params = {"params": jax.tree.map(jnp.asarray, merged)}
    if args.bf16:
        params = jax.tree.map(lambda x: x.astype(jnp.bfloat16), params)
    return params


def run_eval(args):
    from unimatch_tpu.evaluate import flow as E

    model, infer = build_model_and_infer(args, "flow")
    params = _load_params(args, model, infer)
    size = tuple(args.inference_size) if args.inference_size else None
    results = {}
    for val in args.val_dataset:
        if val == "chairs":
            results.update(E.validate_chairs(model, params, infer,
                                             root=f"{args.datasets_root}/FlyingChairs_release/data",
                                             padding_factor=args.padding_factor))
        elif val == "things":
            dstypes = ["frames_cleanpass"]
            if not args.val_things_clean_only:
                dstypes.append("frames_finalpass")
            for dstype in dstypes:
                results.update(E.validate_things(model, params, infer,
                                                 root=f"{args.datasets_root}/FlyingThings3D",
                                                 dstype=dstype,
                                                 padding_factor=args.padding_factor,
                                                 inference_size=size))
        elif val == "sintel":
            for dstype in ("clean", "final"):
                results.update(E.validate_sintel(model, params, infer,
                                                 root=f"{args.datasets_root}/Sintel", dstype=dstype,
                                                 padding_factor=args.padding_factor,
                                                 with_speed_metric=args.with_speed_metric,
                                                 count_time=args.count_time,
                                                 evaluate_matched_unmatched=args.evaluate_matched_unmatched,
                                                 inference_size=size))
        elif val == "kitti":
            results.update(E.validate_kitti(model, params, infer,
                                            root=f"{args.datasets_root}/KITTI",
                                            padding_factor=args.padding_factor,
                                            with_speed_metric=args.with_speed_metric,
                                            count_time=args.count_time,
                                            inference_size=size))
        else:
            raise ValueError(f"unknown val_dataset {val}")
    for k, v in results.items():
        print(f"{k}: {v:.4f}")
    if args.save_eval_to_file:
        import os

        from unimatch_tpu.cli import _append_val_results

        os.makedirs(args.checkpoint_dir, exist_ok=True)
        _append_val_results(args.checkpoint_dir, 0, results)
    return results


def main(args):
    from unimatch_tpu.cli import maybe_sequence_parallel

    with maybe_sequence_parallel(args):
        return _main_modes(args)


def _main_modes(args):
    if args.inference_dir or args.inference_video:
        from unimatch_tpu.inference import inference_flow

        model, infer = build_model_and_infer(args, "flow")
        params = _load_params(args, model, infer)
        inference_flow(
            model, params, infer,
            inference_dir=args.inference_dir,
            inference_video=args.inference_video,
            output_path=args.output_path,
            padding_factor=args.padding_factor,
            inference_size=tuple(args.inference_size) if args.inference_size else None,
            pred_bidir_flow=args.pred_bidir_flow,
            pred_bwd_flow=args.pred_bwd_flow,
            fwd_bwd_consistency_check=args.fwd_bwd_check,
            save_flo_flow=args.save_flo_flow,
            save_video=args.save_video,
            concat_flow_img=args.concat_flow_img,
        )
        return

    if args.eval:
        run_eval(args)
        return

    if args.submission:
        from unimatch_tpu.evaluate import flow as E

        model, infer = build_model_and_infer(args, "flow")
        params = _load_params(args, model, infer)
        size = tuple(args.inference_size) if args.inference_size else None
        for val in args.val_dataset:
            if val == "sintel":
                E.create_sintel_submission(model, params, infer,
                                           root=f"{args.datasets_root}/Sintel",
                                           output_path=args.output_path,
                                           padding_factor=args.padding_factor,
                                           save_vis_flow=args.save_vis_flow,
                                           no_save_flo=args.no_save_flo,
                                           inference_size=size)
            elif val == "kitti":
                E.create_kitti_submission(model, params, infer,
                                          root=f"{args.datasets_root}/KITTI",
                                          output_path=args.output_path,
                                          padding_factor=args.padding_factor,
                                          save_vis_flow=args.save_vis_flow,
                                          inference_size=size)
        return

    # train
    import numpy as np

    def build_dataset_fn(a):
        from unimatch_tpu.data.flow_datasets import build_train_dataset

        return build_train_dataset(a.stage, tuple(a.image_size), root_prefix=a.datasets_root)

    def example_batch_fn(a):
        h, w = a.image_size
        return {
            "img0": np.zeros((1, h, w, 3), np.float32),
            "img1": np.zeros((1, h, w, 3), np.float32),
            "flow_gt": np.zeros((1, h, w, 2), np.float32),
            "valid": np.ones((1, h, w), np.float32),
        }

    def validate_fn(a, model, params, infer):
        """Periodic in-training validation (reference main_flow.py:482-593)."""
        from unimatch_tpu.evaluate import flow as E

        results = {}
        for val in a.val_dataset:
            try:
                if val == "chairs":
                    results.update(E.validate_chairs(
                        model, params, infer,
                        root=f"{a.datasets_root}/FlyingChairs_release/data",
                        padding_factor=a.padding_factor))
                elif val == "sintel":
                    for dstype in ("clean", "final"):
                        results.update(E.validate_sintel(
                            model, params, infer, root=f"{a.datasets_root}/Sintel",
                            dstype=dstype, padding_factor=a.padding_factor,
                            with_speed_metric=False))
                elif val == "kitti":
                    results.update(E.validate_kitti(
                        model, params, infer, root=f"{a.datasets_root}/KITTI",
                        padding_factor=a.padding_factor))
            except FileNotFoundError:
                pass  # validation dataset not present on this host
        return results

    train_loop(args, "flow", build_dataset_fn, example_batch_fn, validate_fn=validate_fn)


if __name__ == "__main__":
    main(get_args_parser().parse_args())


def cli_entry():
    """Console-script entry point (pyproject.toml [project.scripts])."""
    main(get_args_parser().parse_args())
