"""Stereo validation and submission generators.

Capability parity with reference evaluate_stereo.py:
  validate_things      :302  validate_kitti15 :396  validate_eth3d :516
  validate_middlebury  :611  (Q/H/F resolution choice)
  create_kitti_submission :29 (uint16 png), create_eth3d_submission :95
  (pfm + runtime txt), create_submission_middlebury :199
"""

from __future__ import annotations

import os
import time
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.config import InferenceConfig
from unimatch_tpu.evaluate import require_samples
from unimatch_tpu.data.padder import InputPadder
from unimatch_tpu.data.transforms_stereo import IMAGENET_MEAN, IMAGENET_STD
from unimatch_tpu.ops import geometry as G
from unimatch_tpu.utils import frame_utils



def _save_vis_disp(path, disp):
    """Colorized disparity png (reference evaluate_stereo.py:184-187)."""
    from PIL import Image

    from unimatch_tpu.utils.visualization import vis_disparity

    Image.fromarray(vis_disparity(disp)).save(path)

def _jit_stereo(model, infer: InferenceConfig):
    @jax.jit
    def fwd(params, left, right):
        return model.apply(params, left, right, infer=infer)["flow_preds"][-1]

    return fwd


def _normalize(img_np):
    return (img_np.astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD


def _predict_disp(fwd, params, left_np, right_np, padding_factor: int,
                  inference_size: Optional[Tuple[int, int]] = None) -> np.ndarray:
    left = jnp.asarray(_normalize(left_np))[None]
    right = jnp.asarray(_normalize(right_np))[None]
    ori_hw = left.shape[1:3]
    if inference_size is None:
        padder = InputPadder(left.shape, padding_factor=padding_factor)
        left, right = padder.pad(left, right)
        disp = fwd(params, left, right)
        return np.asarray(padder.unpad(disp)[0], np.float32)
    left = G.resize_bilinear_align_corners(left, *inference_size)
    right = G.resize_bilinear_align_corners(right, *inference_size)
    disp = fwd(params, left, right)
    h, w = ori_hw
    disp = G.resize_bilinear_align_corners(disp[..., None], h, w)[..., 0]
    disp = disp * (w / inference_size[1])
    return np.asarray(disp[0], np.float32)


def _metrics(pred: np.ndarray, gt: np.ndarray, valid: np.ndarray, prefix: str) -> Dict[str, float]:
    epe = np.abs(pred - gt)
    v = valid > 0.5
    epe_v = epe[v]
    d1 = ((epe > 3.0) & (epe / np.maximum(np.abs(gt), 1e-6) > 0.05)).astype(np.float32)[v]
    return {
        f"{prefix}_epe": float(epe_v.mean()),
        f"{prefix}_d1": float(100 * d1.mean()),
        f"{prefix}_1px": float(100 * (epe_v > 1).mean()),
        f"{prefix}_3px": float(100 * (epe_v > 3).mean()),
    }


def _validate(ds, model, params, infer, prefix, padding_factor=32, inference_size=None,
              max_disp: Optional[float] = None,
              count_time: bool = False) -> Dict[str, float]:
    fwd = _jit_stereo(model, infer)
    accum: Dict[str, list] = {}
    total_time, num_timed = 0.0, 0
    for i in range(len(ds)):
        s = ds[i]
        valid = s["valid"]
        if max_disp is not None:
            valid = valid * (s["disp_gt"] < max_disp)
        if valid.max() < 1:
            continue
        # dataset returns normalized images when a transform is set; here raw
        if count_time and i >= 5:  # warmup skip (reference evaluate_stereo timing)
            t0 = time.perf_counter()
        pred = _predict_disp(fwd, params, s["img0"], s["img1"], padding_factor, inference_size)
        if count_time and i >= 5:
            total_time += time.perf_counter() - t0
            num_timed += 1
        for k, val in _metrics(pred, s["disp_gt"], valid, prefix).items():
            accum.setdefault(k, []).append(val)
    out = {k: float(np.mean(v)) for k, v in accum.items()}
    if count_time and num_timed:
        out[f"{prefix}_time_per_pair_ms"] = 1000.0 * total_time / num_timed
    return out


def validate_things(model, params, infer, root="datasets/FlyingThings3D", **kw):
    from unimatch_tpu.data.stereo_datasets import FlyingThings3D

    ds = require_samples(FlyingThings3D(root, mode="TEST"), root)
    return _validate(ds, model, params, infer, "things", max_disp=400.0, **kw)


def validate_kitti15(model, params, infer, root="datasets/KITTI/stereo/kitti_2015", **kw):
    from unimatch_tpu.data.stereo_datasets import KITTI15

    ds = require_samples(KITTI15(root, mode="training"), root)
    return _validate(ds, model, params, infer, "kitti15", **kw)


def validate_eth3d(model, params, infer, root="datasets/ETH3D", **kw):
    from unimatch_tpu.data.stereo_datasets import ETH3DStereo

    ds = require_samples(ETH3DStereo(root, mode="train"), root)
    return _validate(ds, model, params, infer, "eth3d", **kw)


def validate_middlebury(model, params, infer, root="datasets/Middlebury/MiddEval3",
                        resolution="H", **kw):
    from unimatch_tpu.data.stereo_datasets import MiddleburyEval3

    ds = require_samples(MiddleburyEval3(root, mode="training", resolution=resolution), root)
    return _validate(ds, model, params, infer, f"middlebury_{resolution}", **kw)


def create_kitti_submission(model, params, infer, root="datasets/KITTI/stereo/kitti_2015",
                            output_path="kitti_stereo_submission", padding_factor=32,
                            save_vis_disp=False, inference_size=None):
    from unimatch_tpu.data.stereo_datasets import KITTI15

    ds = require_samples(KITTI15(root, mode="testing", save_filename=True), root)
    fwd = _jit_stereo(model, infer)
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        pred = _predict_disp(fwd, params, s["left"], s["right"], padding_factor, inference_size)
        out = os.path.join(output_path, s["left_name"])
        if save_vis_disp:  # colorized png instead of the uint16 submission format
            _save_vis_disp(out, pred)
        else:
            frame_utils.write_kitti_disp_png(out, pred)


def create_eth3d_submission(model, params, infer, root="datasets/ETH3D",
                            output_path="eth3d_submission", padding_factor=32,
                            save_vis_disp=False, inference_size=None):
    from unimatch_tpu.data.stereo_datasets import ETH3DStereo

    ds = require_samples(ETH3DStereo(root, mode="test", save_filename=True), root)
    fwd = _jit_stereo(model, infer)
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        t0 = time.perf_counter()
        pred = _predict_disp(fwd, params, s["left"], s["right"], padding_factor, inference_size)
        runtime = time.perf_counter() - t0
        scene = os.path.basename(os.path.dirname(s["left_name"]))
        if save_vis_disp:
            _save_vis_disp(os.path.join(output_path, f"{scene}.png"), pred)
            continue
        frame_utils.write_pfm(os.path.join(output_path, f"{scene}.pfm"), pred)
        with open(os.path.join(output_path, f"{scene}.txt"), "w") as f:
            f.write(f"runtime {runtime}\n")


def create_middlebury_submission(model, params, infer, root="datasets/Middlebury/MiddEval3",
                                 output_path="middlebury_submission", resolution="F",
                                 padding_factor=32, save_vis_disp=False, inference_size=None):
    from unimatch_tpu.data.stereo_datasets import MiddleburyEval3

    ds = require_samples(MiddleburyEval3(root, mode="test", resolution=resolution, save_filename=True), root)
    fwd = _jit_stereo(model, infer)
    for i in range(len(ds)):
        s = ds[i]
        t0 = time.perf_counter()
        pred = _predict_disp(fwd, params, s["left"], s["right"], padding_factor, inference_size)
        runtime = time.perf_counter() - t0
        scene = os.path.basename(os.path.dirname(s["left_name"]))
        out_dir = os.path.join(output_path, f"test{resolution}", scene)
        os.makedirs(out_dir, exist_ok=True)
        if save_vis_disp:
            _save_vis_disp(os.path.join(out_dir, "disp0GM.png"), pred)
            continue
        frame_utils.write_pfm(os.path.join(out_dir, "disp0GM.pfm"), pred)
        with open(os.path.join(out_dir, "timeGM.txt"), "w") as f:
            f.write(f"{runtime}\n")
