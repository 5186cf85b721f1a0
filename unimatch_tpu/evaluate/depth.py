"""Depth validation (ScanNet / DeMoN).

Capability parity with reference evaluate_depth.py:
  validate_scannet :22-154 (abs_rel/sq_rel/rmse/rmse_log/a1/a2/a3 over the
  BA-Net test pairs, eval depth range mask, optional timing)
  validate_demon   :158
"""

from __future__ import annotations

import os
import time
from typing import Dict

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.config import InferenceConfig
from unimatch_tpu.evaluate import require_samples


def _jit_depth(model, infer: InferenceConfig):
    @jax.jit
    def fwd(params, img0, img1, intrinsics, pose):
        return model.apply(
            params, img0, img1, infer=infer, intrinsics=intrinsics, pose=pose
        )["flow_preds"][-1]

    return fwd


def compute_depth_errors(gt: np.ndarray, pred: np.ndarray) -> Dict[str, float]:
    """Standard monodepth error set (reference loss/depth_loss.py:6-24)."""
    thresh = np.maximum(gt / pred, pred / gt)
    return {
        "abs_rel": float(np.mean(np.abs(gt - pred) / gt)),
        "sq_rel": float(np.mean((gt - pred) ** 2 / gt)),
        "rmse": float(np.sqrt(np.mean((gt - pred) ** 2))),
        "rmse_log": float(np.sqrt(np.mean((np.log(gt) - np.log(pred)) ** 2))),
        "a1": float((thresh < 1.25).mean()),
        "a2": float((thresh < 1.25**2).mean()),
        "a3": float((thresh < 1.25**3).mean()),
    }


def validate_dataset(ds, model, params, infer: InferenceConfig,
                     eval_min_depth: float = 0.5, eval_max_depth: float = 10.0,
                     count_time: bool = False,
                     save_vis_depth: bool = False,
                     save_dir: str = None) -> Dict[str, float]:
    if save_vis_depth:
        assert save_dir is not None, "--save_vis_depth needs --save_dir"
        os.makedirs(save_dir, exist_ok=True)
    fwd = _jit_depth(model, infer)
    accum: Dict[str, list] = {}
    total_time, num_timed = 0.0, 0

    for i in range(len(ds)):
        s = ds[i]
        img0 = jnp.asarray(s["img0"])[None]
        img1 = jnp.asarray(s["img1"])[None]
        K = jnp.asarray(s["intrinsics"])[None]
        pose = jnp.asarray(s["pose"])[None]
        if count_time and i >= 5:
            t0 = time.perf_counter()
        pred = np.asarray(fwd(params, img0, img1, K, pose)[0], np.float32)
        if count_time and i >= 5:
            total_time += time.perf_counter() - t0
            num_timed += 1
        if save_vis_depth:
            from PIL import Image

            from unimatch_tpu.utils.visualization import viz_depth_tensor

            Image.fromarray(viz_depth_tensor(pred)).save(
                os.path.join(save_dir, f"{i:06d}_depth.png"))
        gt = s["depth_gt"]
        mask = (s["valid"] > 0.5) & (gt >= eval_min_depth) & (gt <= eval_max_depth)
        if mask.sum() == 0:
            continue
        pred_c = np.clip(pred, eval_min_depth, eval_max_depth)
        for k, v in compute_depth_errors(gt[mask], pred_c[mask]).items():
            accum.setdefault(k, []).append(v)

    out = {k: float(np.mean(v)) for k, v in accum.items()}
    if count_time and num_timed:
        out["time_per_pair_ms"] = 1000.0 * total_time / num_timed
    return out


def validate_scannet(model, params, infer: InferenceConfig, root: str = "datasets/Scannet",
                     **kw) -> Dict[str, float]:
    from unimatch_tpu.data.depth_datasets import ScannetDataset, Compose, NormalizeImages

    ds = require_samples(ScannetDataset(data_dir=root, mode="test", transforms=Compose([NormalizeImages()])), root)
    return validate_dataset(ds, model, params, infer, **kw)


def validate_demon(model, params, infer: InferenceConfig, root: str = "datasets/Demon",
                   split: str = "rgbd", **kw) -> Dict[str, float]:
    from unimatch_tpu.data.depth_datasets import DemonDataset, Compose, NormalizeImages

    ds = require_samples(
        DemonDataset(data_dir=root, mode="test", split=split,
                     transforms=Compose([NormalizeImages()])), root)
    return validate_dataset(ds, model, params, infer, **kw)


class _DepthTaskConfig:
    """Minimal config shim so make_train_step sees a depth-task model."""

    task = "depth"


class DepthSplatAdapter:
    """Adapts UniMatchDepthSplat to the UniMatch depth model interface
    (init/apply with infer=/intrinsics=/pose= kwargs), so the same
    validate_dataset driver and train_loop work for both model families
    (reference main_depth.py:151-155 model switch).

    The DepthSplat forward is always bidirectional; validation and the
    training loss score the forward (reference-view) prediction, matching
    the reference's eval.
    """

    config = _DepthTaskConfig()

    def __init__(self, model, attn_splits_list=(2,)):
        self.model = model
        self.attn_splits_list = tuple(attn_splits_list)

    def _kwargs(self, infer, training):
        return dict(
            attn_splits_list=self.attn_splits_list,
            min_depth=infer.min_depth if infer else 1.0 / 10.0,
            max_depth=infer.max_depth if infer else 1.0 / 0.5,
            training=training,
        )

    def init(self, rng, img0, img1, infer=None, training=False,
             intrinsics=None, pose=None, **kw):
        return self.model.init(
            rng, img0, img1, intrinsics, pose, **self._kwargs(infer, training))

    def apply(self, params, img0, img1, infer=None, training=False,
              intrinsics=None, pose=None, **kw):
        out = self.model.apply(
            params, img0, img1, intrinsics, pose, **self._kwargs(infer, training))
        preds = out["flow_preds"]
        b = img0.shape[0]
        # keep only the forward-view prediction
        return {"flow_preds": [p[:b] for p in preds]}


def validate_scannet_depthsplat(model, params, infer, root: str = "datasets/Scannet",
                                attn_splits_list=(2,), **kw):
    from unimatch_tpu.data.depth_datasets import ScannetDataset, Compose, NormalizeImages

    ds = require_samples(ScannetDataset(data_dir=root, mode="test", transforms=Compose([NormalizeImages()])), root)
    adapter = DepthSplatAdapter(model, attn_splits_list)
    return validate_dataset(ds, adapter, params, infer, **kw)
