#!/usr/bin/env python
"""Two-view posed depth driver: train / --eval / --inference_dir.

CLI-compatible with the reference's main_depth.py.
"""

import argparse

from unimatch_tpu.cli import add_common_args, build_model_and_infer, train_loop


def get_args_parser():
    parser = argparse.ArgumentParser("unimatch_tpu depth")
    add_common_args(parser)
    # the reference names the training-stage flag --dataset (main_depth.py:28);
    # --stage is kept as an alias for symmetry with the flow/stereo drivers
    parser.add_argument("--dataset", "--stage", dest="stage", default="scannet", type=str)
    parser.add_argument("--task", default="depth", choices=["depth"], type=str)
    parser.add_argument("--image_size", default=[480, 640], type=int, nargs="+")
    parser.add_argument("--val_dataset", default=["scannet"], type=str, nargs="+")
    parser.add_argument("--demon_split", default="rgbd", type=str)
    parser.add_argument("--save_vis_depth", action="store_true")
    parser.add_argument("--save_dir", default=None, type=str)
    parser.add_argument("--workers", dest="num_workers", default=argparse.SUPPRESS, type=int)
    parser.add_argument("--depth_grad_loss_weight", default=20.0, type=float)
    parser.add_argument("--min_depth", default=0.5, type=float)
    parser.add_argument("--max_depth", default=10.0, type=float)
    parser.add_argument("--eval_min_depth", default=0.5, type=float)
    parser.add_argument("--eval_max_depth", default=10.0, type=float)
    parser.add_argument("--num_depth_candidates", default=64, type=int)
    parser.add_argument("--depth_from_argmax", action="store_true")
    parser.add_argument("--pred_bidir_depth", action="store_true")
    parser.add_argument("--inference_dir", default=None, type=str)
    parser.add_argument("--output_path", default="output", type=str)
    parser.add_argument("--depth_loss_weight", default=20.0, type=float)
    # DepthSplat variant (mono ViT prior + cross-view UNet regressor)
    parser.add_argument("--depthsplat_depth", action="store_true")
    parser.add_argument("--vit_type", default="vits", type=str)
    parser.add_argument("--lowest_feature_resolution", default=8, type=int)
    return parser


def _build_depthsplat(args):
    from unimatch_tpu.models.unimatch_depthsplat import DepthSplatConfig, UniMatchDepthSplat

    cfg = DepthSplatConfig(
        num_scales=args.num_scales,
        feature_channels=args.feature_channels,
        upsample_factor=args.upsample_factor,
        ffn_dim_expansion=args.ffn_dim_expansion,
        num_transformer_layers=args.num_transformer_layers,
        num_depth_candidates=max(args.num_depth_candidates, 128),
        vit_type=args.vit_type,
    )
    return UniMatchDepthSplat(config=cfg)


def _run_depthsplat_inference(args):
    """DepthSplat inference on a ScanNet-style directory."""
    import glob
    import os

    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimatch_tpu.ops.geometry import resize_bilinear_align_corners
    from unimatch_tpu.utils import frame_utils

    model = _build_depthsplat(args)

    color_paths = sorted(
        sum((glob.glob(os.path.join(args.inference_dir, "color", e)) for e in ("*.png", "*.jpg")), [])
    )
    pose_paths = sorted(glob.glob(os.path.join(args.inference_dir, "pose", "*.txt")))
    K = np.loadtxt(os.path.join(args.inference_dir, "intrinsic", "intrinsic_depth.txt")).astype(
        np.float32
    )[:3, :3]
    mean = jnp.asarray([0.485, 0.456, 0.406]) * 255
    std = jnp.asarray([0.229, 0.224, 0.225]) * 255

    os.makedirs(args.output_path, exist_ok=True)
    variables = None
    for i in range(len(color_paths) - 1):
        img_ref = frame_utils.read_image(color_paths[i])
        img_tgt = frame_utils.read_image(color_paths[i + 1])
        pose_ref = np.loadtxt(pose_paths[i]).astype(np.float32)
        pose_tgt = np.loadtxt(pose_paths[i + 1]).astype(np.float32)
        pose_rel = np.linalg.inv(pose_tgt) @ pose_ref

        h0, w0 = img_ref.shape[:2]
        pf = args.padding_factor
        h = int(round(h0 / pf)) * pf
        w = int(round(w0 / pf)) * pf
        Ks = K.copy()
        Ks[0] *= w / w0
        Ks[1] *= h / h0
        ref_j = (resize_bilinear_align_corners(jnp.asarray(img_ref)[None], h, w) - mean) / std
        tgt_j = (resize_bilinear_align_corners(jnp.asarray(img_tgt)[None], h, w) - mean) / std

        if variables is None:
            variables = model.init(
                jax.random.PRNGKey(0), ref_j, tgt_j, jnp.asarray(Ks)[None],
                jnp.asarray(pose_rel)[None], attn_splits_list=tuple(args.attn_splits_list),
            )
            if args.resume:
                from unimatch_tpu import checkpoint as ckpt
                from unimatch_tpu.convert_depthsplat import convert_depthsplat_state_dict

                if args.resume.endswith((".pth", ".pt")):
                    import torch

                    raw = torch.load(args.resume, map_location="cpu", weights_only=False)
                    state = raw.get("model", raw) if isinstance(raw, dict) else raw
                    loaded = convert_depthsplat_state_dict(state)
                else:
                    loaded = ckpt.restore(args.resume)
                    loaded = loaded.get("params", loaded)
                merged = ckpt.merge_params(
                    jax.device_get(variables["params"]), loaded, strict=args.strict_resume
                )
                variables = {"params": jax.tree.map(jnp.asarray, merged)}

        depth = model.apply(
            variables, ref_j, tgt_j, jnp.asarray(Ks)[None], jnp.asarray(pose_rel)[None],
            attn_splits_list=tuple(args.attn_splits_list),
            min_depth=1.0 / args.max_depth, max_depth=1.0 / args.min_depth,
        )["flow_preds"][-1]

        from unimatch_tpu.utils.visualization import viz_depth_tensor
        from PIL import Image

        base = os.path.join(args.output_path, os.path.splitext(os.path.basename(color_paths[i]))[0])
        depth_np = np.asarray(depth[0], np.float32)  # forward view
        Image.fromarray(viz_depth_tensor(depth_np)).save(base + "_depth.png")
        np.save(base + "_depth.npy", depth_np)


def _load_params(args, model, infer):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from unimatch_tpu import checkpoint as ckpt

    img = jnp.zeros((1, 64, 96, 3), jnp.float32)
    K = jnp.asarray(np.eye(3, dtype=np.float32)[None] * 50.0)
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    params = model.init(jax.random.PRNGKey(0), img, img, infer=infer, intrinsics=K, pose=pose)
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


def _load_depthsplat_params(args, model):
    """Init DepthSplat params (shape-independent) and optionally resume."""
    import numpy as np
    import jax
    import jax.numpy as jnp

    from unimatch_tpu import checkpoint as ckpt

    img = jnp.zeros((1, 96, 128, 3), jnp.float32)
    K = jnp.asarray(np.array([[100.0, 0, 64], [0, 100.0, 48], [0, 0, 1]], np.float32))[None]
    pose = jnp.asarray(np.eye(4, dtype=np.float32)[None])
    variables = model.init(jax.random.PRNGKey(0), img, img, K, pose,
                           attn_splits_list=tuple(args.attn_splits_list))
    if args.resume:
        loaded = ckpt.load_any_params(args.resume)
        merged = ckpt.merge_params(
            jax.device_get(variables["params"]), loaded.get("params", loaded),
            strict=args.strict_resume,
        )
        variables = {"params": jax.tree.map(jnp.asarray, merged)}
    return variables


def main(args):
    from unimatch_tpu.cli import maybe_sequence_parallel

    with maybe_sequence_parallel(args):
        return _main_modes(args)


def _main_modes(args):
    if args.depthsplat_depth:
        if args.inference_dir:
            _run_depthsplat_inference(args)
            return
        from unimatch_tpu.evaluate.depth import DepthSplatAdapter

        _, infer = build_model_and_infer(args, "depth")
        ds_model = _build_depthsplat(args)
        if args.eval:
            from unimatch_tpu.evaluate import depth as E

            params = _load_depthsplat_params(args, ds_model)
            results = E.validate_scannet_depthsplat(
                ds_model, params, infer, root=f"{args.datasets_root}/Scannet",
                attn_splits_list=tuple(args.attn_splits_list),
                eval_min_depth=args.eval_min_depth, eval_max_depth=args.eval_max_depth)
            for k, v in results.items():
                print(f"{k}: {v:.4f}")
            return
        # train: the adapter exposes the UniMatch depth interface, so the
        # generic loop (dual L1+grad loss, reference main_depth.py:381-401)
        # drives DepthSplat unchanged.
        adapter = DepthSplatAdapter(ds_model, tuple(args.attn_splits_list))
        _train(args, model_and_infer=(adapter, infer))
        return

    if args.inference_dir:
        from unimatch_tpu.inference import inference_depth

        model, infer = build_model_and_infer(args, "depth")
        params = _load_params(args, model, infer)
        inference_depth(
            model, params, infer,
            inference_dir=args.inference_dir,
            output_path=args.output_path,
            padding_factor=args.padding_factor,
            depth_from_argmax=args.depth_from_argmax,
            pred_bidir_depth=args.pred_bidir_depth,
        )
        return

    if args.eval:
        from unimatch_tpu.evaluate import depth as E

        model, infer = build_model_and_infer(args, "depth")
        params = _load_params(args, model, infer)
        results = {}
        vis_kw = dict(save_vis_depth=args.save_vis_depth,
                      save_dir=args.save_dir or args.output_path)
        for val in args.val_dataset:
            if val == "scannet":
                results.update(E.validate_scannet(
                    model, params, infer, root=f"{args.datasets_root}/Scannet",
                    eval_min_depth=args.eval_min_depth, eval_max_depth=args.eval_max_depth,
                    count_time=args.count_time, **vis_kw))
            elif val == "demon":
                results.update(E.validate_demon(
                    model, params, infer, root=f"{args.datasets_root}/Demon",
                    split=args.demon_split,
                    eval_min_depth=args.eval_min_depth, eval_max_depth=args.eval_max_depth,
                    **vis_kw))
        for k, v in results.items():
            print(f"{k}: {v:.4f}")
        return

    _train(args)


def _train(args, model_and_infer=None):
    import numpy as np

    def build_dataset_fn(a):
        from unimatch_tpu.data.depth_datasets import (
            DemonDataset, ScannetDataset, build_depth_train_transforms,
        )

        tr = build_depth_train_transforms(crop_size=tuple(a.image_size))
        if a.stage == "scannet":
            return ScannetDataset(data_dir=f"{a.datasets_root}/Scannet", mode="train", transforms=tr)
        if a.stage == "demon":
            return DemonDataset(data_dir=f"{a.datasets_root}/Demon", mode="train", transforms=tr)
        raise ValueError(f"unknown stage {a.stage}")

    def example_batch_fn(a):
        h, w = a.image_size
        return {
            "img0": np.zeros((1, h, w, 3), np.float32),
            "img1": np.zeros((1, h, w, 3), np.float32),
            "depth_gt": np.ones((1, h, w), np.float32),
            "valid": np.ones((1, h, w), np.float32),
            "intrinsics": np.eye(3, dtype=np.float32)[None] * 50.0,
            "pose": np.eye(4, dtype=np.float32)[None],
        }

    def validate_fn(a, model, params, infer):
        """Periodic in-training validation (reference main_depth.py val branch)."""
        from unimatch_tpu.evaluate import depth as E

        results = {}
        for val in a.val_dataset:
            try:
                if val == "scannet":
                    results.update(E.validate_scannet(
                        model, params, infer, root=f"{a.datasets_root}/Scannet",
                        eval_min_depth=a.eval_min_depth,
                        eval_max_depth=a.eval_max_depth))
                elif val == "demon":
                    results.update(E.validate_demon(
                        model, params, infer, root=f"{a.datasets_root}/Demon",
                        eval_min_depth=a.eval_min_depth,
                        eval_max_depth=a.eval_max_depth))
            except FileNotFoundError:
                pass  # validation dataset not present on this host
        return results

    train_loop(args, "depth", build_dataset_fn, example_batch_fn,
               validate_fn=validate_fn, model_and_infer=model_and_infer)


if __name__ == "__main__":
    main(get_args_parser().parse_args())


def cli_entry():
    """Console-script entry point (pyproject.toml [project.scripts])."""
    main(get_args_parser().parse_args())
