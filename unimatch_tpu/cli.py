"""Shared CLI machinery for the three task drivers.

The reference drives everything with argparse flags (main_flow.py:23-134,
main_stereo.py:28-122, main_depth.py:22-113); this module keeps the same flag
names so the reference's scripts/*.sh hyper-parameters port directly, and
implements the shared training loop:

  dataset stages -> DataLoader (per-epoch reshuffle, host sharding)
  -> jit'd data-parallel train step (AdamW + OneCycle, clip 1.0, NaN-skip)
  -> periodic validation / checkpointing (orbax) / TensorBoard logging.
"""

from __future__ import annotations

import argparse
import json
import os
import time
from typing import Dict, Optional

import numpy as np


def add_common_args(parser: argparse.ArgumentParser) -> None:
    # checkpointing / dirs
    parser.add_argument("--checkpoint_dir", default="tmp", type=str)
    parser.add_argument("--eval", action="store_true")
    parser.add_argument("--resume", default=None, type=str)
    parser.add_argument("--strict_resume", action="store_true")
    parser.add_argument("--no_resume_optimizer", action="store_true")
    # model architecture (must match checkpoints)
    parser.add_argument("--num_scales", default=1, type=int)
    parser.add_argument("--feature_channels", default=128, type=int)
    parser.add_argument("--upsample_factor", default=8, type=int)
    parser.add_argument("--num_head", default=1, type=int)
    parser.add_argument("--ffn_dim_expansion", default=4, type=int)
    parser.add_argument("--num_transformer_layers", default=6, type=int)
    parser.add_argument("--reg_refine", action="store_true")
    # matching (parameter-free, runtime tunable)
    parser.add_argument("--attn_type", default="swin", type=str)
    parser.add_argument("--attn_splits_list", default=[2], type=int, nargs="+")
    parser.add_argument("--corr_radius_list", default=[-1], type=int, nargs="+")
    parser.add_argument("--prop_radius_list", default=[-1], type=int, nargs="+")
    parser.add_argument("--num_reg_refine", default=1, type=int)
    # training
    parser.add_argument("--lr", default=4e-4, type=float)
    parser.add_argument("--batch_size", default=8, type=int)
    parser.add_argument("--num_workers", default=4, type=int)
    parser.add_argument("--weight_decay", default=1e-4, type=float)
    parser.add_argument("--grad_clip", default=1.0, type=float)
    parser.add_argument("--num_steps", default=100000, type=int)
    parser.add_argument("--seed", default=326, type=int)
    parser.add_argument("--summary_freq", default=100, type=int)
    parser.add_argument("--val_freq", default=10000, type=int)
    parser.add_argument("--save_ckpt_freq", default=10000, type=int)
    parser.add_argument("--save_latest_ckpt_freq", default=1000, type=int)
    # inference sizes
    parser.add_argument("--padding_factor", default=16, type=int)
    parser.add_argument("--inference_size", default=None, type=int, nargs="+")
    parser.add_argument("--count_time", action="store_true")
    parser.add_argument("--bf16", action="store_true", help="bf16 params/activations")
    parser.add_argument("--num_sp_devices", default=0, type=int,
                        help="shard the global-matching token dimension over this many "
                             "devices (sequence parallelism) during eval/inference; "
                             "0 = off (capability beyond the reference)")
    parser.add_argument("--datasets_root", default="datasets", type=str)
    # CUDA-reference launcher flags, accepted for script compatibility but
    # unused on TPU: the JAX runtime discovers devices/processes itself
    # (parallel/mesh.py; reference utils/dist_utils.py:12-71)
    parser.add_argument("--distributed", action="store_true")
    parser.add_argument("--launcher", default="none", type=str)
    parser.add_argument("--gpu_ids", default=[0], type=int, nargs="+")
    parser.add_argument("--local_rank", default=0, type=int)
    parser.add_argument("--debug", action="store_true")


def maybe_sequence_parallel(args):
    """Context manager activating token-sharded global matching when
    --num_sp_devices > 1 (no-op otherwise)."""
    import contextlib

    n = getattr(args, "num_sp_devices", 0)
    if n and n > 1:
        import jax

        from unimatch_tpu.parallel.context import sequence_parallel
        from unimatch_tpu.parallel.mesh import make_mesh

        devices = jax.devices()[:n]
        assert len(devices) == n, f"--num_sp_devices={n} but only {len(jax.devices())} devices"
        return sequence_parallel(make_mesh(devices, axis="sp"))
    return contextlib.nullcontext()


def build_model_and_infer(args, task: str):
    from unimatch_tpu.config import InferenceConfig, ModelConfig
    from unimatch_tpu.models.unimatch import UniMatch

    cfg = ModelConfig(
        task=task,
        num_scales=args.num_scales,
        feature_channels=args.feature_channels,
        upsample_factor=args.upsample_factor,
        num_head=args.num_head,
        ffn_dim_expansion=args.ffn_dim_expansion,
        num_transformer_layers=args.num_transformer_layers,
        reg_refine=args.reg_refine,
    )
    infer_kwargs = dict(
        attn_type=args.attn_type,
        attn_splits_list=tuple(args.attn_splits_list),
        corr_radius_list=tuple(args.corr_radius_list),
        prop_radius_list=tuple(args.prop_radius_list),
        num_reg_refine=args.num_reg_refine,
    )
    if task == "depth":
        infer_kwargs.update(
            min_depth=1.0 / getattr(args, "max_depth", 10.0),
            max_depth=1.0 / getattr(args, "min_depth", 0.5),
            num_depth_candidates=getattr(args, "num_depth_candidates", 64),
        )
    infer = InferenceConfig(**infer_kwargs)
    return UniMatch(config=cfg), infer


def save_run_metadata(args) -> None:
    """args.json + command audit trail (reference utils/misc.py:13-36)."""
    import sys

    os.makedirs(args.checkpoint_dir, exist_ok=True)
    with open(os.path.join(args.checkpoint_dir, "args.json"), "w") as f:
        json.dump(vars(args), f, indent=2, default=str)
    with open(os.path.join(args.checkpoint_dir, "command_train.txt"), "a") as f:
        f.write(" ".join(sys.argv) + "\n")


def train_loop(args, task: str, build_dataset_fn, example_batch_fn,
               validate_fn: Optional[callable] = None,
               model_and_infer=None) -> None:
    """Generic training driver (reference main_flow.py:409-601 semantics)."""
    import jax
    import jax.numpy as jnp

    from unimatch_tpu import checkpoint as ckpt
    from unimatch_tpu.data.loader import DataLoader, device_prefetch
    from unimatch_tpu.logger import Logger
    from unimatch_tpu.parallel import make_mesh, make_train_step
    from unimatch_tpu.parallel.train import (
        TrainState, create_train_state, make_lr_schedule, make_optimizer,
    )

    np.random.seed(args.seed)
    save_run_metadata(args)

    model, infer = model_and_infer or build_model_and_infer(args, task)
    # data-parallel mesh over as many devices as evenly divide the batch
    import math

    n_dev = math.gcd(args.batch_size, jax.device_count())
    mesh = make_mesh(jax.devices()[:n_dev]) if n_dev > 1 else None

    dataset = build_dataset_fn(args)
    loader = DataLoader(
        dataset,
        batch_size=args.batch_size // max(jax.process_count(), 1),
        num_workers=args.num_workers,
        seed=args.seed,
        shard_index=jax.process_index(),
        num_shards=max(jax.process_count(), 1),
        # process workers for real training on multi-core hosts: the
        # numpy/cv2 augmentors are GIL-bound, so threads plateau at ~2
        # workers (scripts/bench_loader.py); on few-core containers the
        # fork+IPC overhead outweighs parallelism
        use_processes=args.num_workers > 2 and (os.cpu_count() or 1) >= 4,
    )
    print(f"=> {len(dataset)} training samples")

    tx = make_optimizer(
        lr=args.lr, total_steps=args.num_steps,
        weight_decay=args.weight_decay, grad_clip=args.grad_clip,
    )
    lr_schedule = make_lr_schedule(args.lr, args.num_steps)
    example = example_batch_fn(args)
    state = create_train_state(model, jax.random.PRNGKey(args.seed), example, infer, tx=tx)

    n_params = sum(int(np.prod(np.shape(x))) for x in jax.tree.leaves(state.params))
    print(f"=> model parameters: {n_params / 1e6:.2f} M")
    with open(os.path.join(args.checkpoint_dir, f"{n_params}_parameters"), "w"):
        pass

    start_epoch = 0
    if args.resume:
        loaded = None
        if not args.resume.endswith((".pth", ".pt")):
            template = {
                "params": jax.device_get(state.params),
                "opt_state": jax.device_get(state.opt_state),
                "step": 0,
                "epoch": 0,
            }
            try:
                loaded = ckpt.restore(args.resume, template=template)
            except Exception:
                loaded = ckpt.restore(args.resume)
        if isinstance(loaded, dict) and "opt_state" in loaded and not args.no_resume_optimizer:
            state = TrainState(
                step=jnp.asarray(loaded["step"], jnp.int32),
                params=jax.tree.map(jnp.asarray, loaded["params"]),
                opt_state=jax.tree.map(jnp.asarray, loaded["opt_state"]),
                tx=tx,
            )
            start_epoch = int(loaded.get("epoch", 0))
        else:
            params = ckpt.load_any_params(args.resume)
            params = ckpt.merge_params(
                jax.device_get(state.params), params.get("params", params),
                strict=args.strict_resume,
                exclude_upsampler=getattr(args, "resume_exclude_upsampler", False),
            )
            state = state.replace(params=jax.tree.map(jnp.asarray, params))
        print(f"=> resumed from {args.resume} at step {int(state.step)}")

    loss_kwargs = {}
    if hasattr(args, "gamma"):
        loss_kwargs["gamma"] = args.gamma
    if task == "flow" and hasattr(args, "max_flow"):
        loss_kwargs["max_flow"] = float(args.max_flow)
    if task == "depth" and hasattr(args, "depth_loss_weight"):
        loss_kwargs["depth_loss_weight"] = args.depth_loss_weight
    if task == "depth" and hasattr(args, "depth_grad_loss_weight"):
        loss_kwargs["depth_grad_loss_weight"] = args.depth_grad_loss_weight
    step_fn = make_train_step(model, infer, mesh=mesh, **loss_kwargs)
    logger = Logger(args.checkpoint_dir, summary_freq=args.summary_freq,
                    start_step=int(state.step))

    total_steps = int(state.step)
    epoch = start_epoch
    t_last = time.perf_counter()
    while total_steps < args.num_steps:
        loader.set_epoch(epoch)
        for batch in device_prefetch(loader, mesh=mesh):
            state, metrics = step_fn(state, batch)
            total_steps += 1
            pred = metrics.pop("_pred", None)  # fetched only on summary steps
            logger.push(jax.device_get(metrics))

            if total_steps % args.summary_freq == 0:
                dt = (time.perf_counter() - t_last) / args.summary_freq
                t_last = time.perf_counter()
                loss = float(jax.device_get(metrics["loss"]))
                lr_now = float(lr_schedule(total_steps))
                logger.add_scalar("train/lr", lr_now, total_steps)
                print(f"step {total_steps} loss {loss:.4f} lr {lr_now:.2e} "
                      f"({dt*1000:.0f} ms/step)")
                try:
                    img0_np = np.asarray(jax.device_get(batch["img0"][0]))
                    pred_np = None if pred is None else np.asarray(
                        jax.device_get(pred[0]), np.float32)
                    if task == "flow" and "flow_gt" in batch and pred_np is not None:
                        # colorized flow panel (reference logger.py:39-61)
                        img1_np = np.asarray(jax.device_get(batch["img1"][0]))
                        gt_np = np.asarray(jax.device_get(batch["flow_gt"][0]))
                        logger.add_image_summary(img0_np, img1_np, pred_np, gt_np, total_steps)
                    elif task == "stereo" and "disp_gt" in batch and pred_np is not None:
                        gt_np = np.asarray(jax.device_get(batch["disp_gt"][0]))
                        logger.add_disp_image_summary(img0_np, pred_np, gt_np, total_steps)
                    elif task == "depth" and "depth_gt" in batch and pred_np is not None:
                        gt_np = np.asarray(jax.device_get(batch["depth_gt"][0]))
                        logger.add_depth_image_summary(img0_np, pred_np, gt_np, total_steps)
                except Exception:
                    pass  # image summaries are best-effort

            if total_steps % args.save_ckpt_freq == 0 or total_steps == args.num_steps:
                ckpt.save_params(
                    os.path.join(args.checkpoint_dir, f"step_{total_steps:06d}"), state.params
                )
            if total_steps % args.save_latest_ckpt_freq == 0:
                ckpt.save_training_state(
                    os.path.join(args.checkpoint_dir, "checkpoint_latest"), state, epoch
                )
            if validate_fn is not None and total_steps % args.val_freq == 0:
                results = validate_fn(args, model, {"params": state.params}, infer)
                logger.add_dict(results, "val", total_steps)
                _append_val_results(args.checkpoint_dir, total_steps, results)

            if total_steps >= args.num_steps:
                break
        epoch += 1

    logger.close()


def _append_val_results(checkpoint_dir: str, step: int, results: Dict[str, float]) -> None:
    """Markdown-format val_results.txt append (reference main_flow.py:544-592)."""
    path = os.path.join(checkpoint_dir, "val_results.txt")
    with open(path, "a") as f:
        f.write(f"\nstep: {step:06d}\n")
        for k, v in results.items():
            f.write(f"| {k}: {v:.4f} ")
        f.write("\n")
