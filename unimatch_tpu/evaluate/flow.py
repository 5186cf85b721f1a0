"""Optical-flow validation and benchmark-submission generators.

Capability parity with reference evaluate_flow.py:
  validate_chairs :160   (EPE over validation split)
  validate_things :247   (clean/final passes, max-flow 400 filter)
  validate_sintel :349   (EPE + matched/unmatched via occlusion maps,
                          s0-10 / s10-40 / s40+ speed buckets, timing mode)
  validate_kitti  :498   (EPE + F1-all = EPE>3 AND EPE/mag>0.05)
  create_sintel_submission :20  (.flo writers per scene)
  create_kitti_submission  :91  (16-bit png)

All validators run batch-1 with InputPadder (or fixed inference_size with
flow rescaling) exactly like the reference — the pre/post-processing is part
of the metric contract.
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
from unimatch_tpu.ops import geometry as G
from unimatch_tpu.utils import frame_utils


def _jit_flow(model, infer: InferenceConfig, pred_bidir_flow: bool = False):
    @jax.jit
    def fwd(params, img0, img1):
        return model.apply(
            params, img0, img1, infer=infer, pred_bidir_flow=pred_bidir_flow
        )["flow_preds"][-1]

    return fwd


def _run_padded(fwd, params, img0_np, img1_np, padding_factor: int,
                inference_size: Optional[Tuple[int, int]] = None,
                padder_mode: str = "sintel"):
    img0 = jnp.asarray(img0_np)[None]
    img1 = jnp.asarray(img1_np)[None]
    ori_hw = img0.shape[1:3]
    if inference_size is None:
        padder = InputPadder(img0.shape, mode=padder_mode, padding_factor=padding_factor)
        img0, img1 = padder.pad(img0, img1)
        flow = fwd(params, img0, img1)
        return np.asarray(padder.unpad(flow)[0], np.float32)
    img0 = G.resize_bilinear_align_corners(img0, *inference_size)
    img1 = G.resize_bilinear_align_corners(img1, *inference_size)
    flow = fwd(params, img0, img1)
    h, w = ori_hw
    flow = G.resize_bilinear_align_corners(flow, h, w)
    flow = flow * jnp.asarray([w / inference_size[1], h / inference_size[0]], flow.dtype)
    return np.asarray(flow[0], np.float32)


def validate_chairs(model, params, infer: InferenceConfig, root: str = "datasets/FlyingChairs_release/data",
                    padding_factor: int = 8) -> Dict[str, float]:
    from unimatch_tpu.data.flow_datasets import FlyingChairs

    ds = require_samples(FlyingChairs(aug_params=None, split="validation", root=root), root)
    fwd = _jit_flow(model, infer)
    epes = []
    for i in range(len(ds)):
        s = ds[i]
        flow = _run_padded(fwd, params, s["img0"], s["img1"], padding_factor)
        epe = np.sqrt(((flow - s["flow_gt"]) ** 2).sum(-1))
        epes.append(epe.reshape(-1))
    epe_all = np.concatenate(epes)
    return {"chairs_epe": float(epe_all.mean())}


def validate_things(model, params, infer: InferenceConfig, root: str = "datasets/FlyingThings3D",
                    dstype: str = "frames_cleanpass", padding_factor: int = 8,
                    max_val_flow: float = 400.0,
                    inference_size: Optional[Tuple[int, int]] = None) -> Dict[str, float]:
    from unimatch_tpu.data.flow_datasets import FlyingThings3D

    ds = require_samples(FlyingThings3D(aug_params=None, root=root, dstype=dstype, test_set=True), root)
    fwd = _jit_flow(model, infer)
    epes = []
    for i in range(len(ds)):
        s = ds[i]
        gt = s["flow_gt"]
        mag = np.sqrt((gt**2).sum(-1))
        valid = (s["valid"] >= 0.5) & (mag < max_val_flow)
        if valid.max() < 1:
            continue
        flow = _run_padded(fwd, params, s["img0"], s["img1"], padding_factor, inference_size)
        epe = np.sqrt(((flow - gt) ** 2).sum(-1))
        epes.append(epe[valid].reshape(-1))
    epe_all = np.concatenate(epes)
    key = "things_clean" if "clean" in dstype else "things_final"
    return {f"{key}_epe": float(epe_all.mean())}


def _in_image_mask(flow_gt: np.ndarray) -> np.ndarray:
    """True where the flow target lands inside the image (reference
    compute_out_of_boundary_mask, used for matched/unmatched metrics)."""
    h, w, _ = flow_gt.shape
    ys, xs = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    tx = xs + flow_gt[..., 0]
    ty = ys + flow_gt[..., 1]
    return (tx >= 0) & (tx <= w - 1) & (ty >= 0) & (ty <= h - 1)


def validate_sintel(model, params, infer: InferenceConfig, root: str = "datasets/Sintel",
                    dstype: str = "clean", padding_factor: int = 8,
                    with_speed_metric: bool = True, count_time: bool = False,
                    evaluate_matched_unmatched: bool = False,
                    inference_size: Optional[Tuple[int, int]] = None) -> Dict[str, float]:
    from unimatch_tpu.data.flow_datasets import MpiSintel

    ds = require_samples(MpiSintel(aug_params=None, split="training", dstype=dstype, root=root,
                                 load_occlusion=evaluate_matched_unmatched), root)
    fwd = _jit_flow(model, infer)

    epe_list, s010, s1040, s40 = [], [], [], []
    matched, unmatched = [], []
    total_time, num_timed = 0.0, 0
    for i in range(len(ds)):
        s = ds[i]
        if count_time and i >= 5:
            t0 = time.perf_counter()
        flow = _run_padded(fwd, params, s["img0"], s["img1"], padding_factor, inference_size)
        if count_time and i >= 5:
            total_time += time.perf_counter() - t0
            num_timed += 1
        gt = s["flow_gt"]
        epe = np.sqrt(((flow - gt) ** 2).sum(-1))
        epe_list.append(epe.reshape(-1))
        if evaluate_matched_unmatched:
            m = (s["noc_valid"] > 0.5) & _in_image_mask(gt)
            if m.any():
                matched.append(epe[m])
                unmatched.append(epe[~m])
        if with_speed_metric:
            mag = np.sqrt((gt**2).sum(-1))
            if (mag < 10).any():
                s010.append(epe[mag < 10])
            if ((mag >= 10) & (mag <= 40)).any():
                s1040.append(epe[(mag >= 10) & (mag <= 40)])
            if (mag > 40).any():
                s40.append(epe[mag > 40])

    epe_all = np.concatenate(epe_list)
    out = {
        f"sintel_{dstype}_epe": float(epe_all.mean()),
        f"sintel_{dstype}_1px": float((epe_all > 1).mean()),
        f"sintel_{dstype}_3px": float((epe_all > 3).mean()),
        f"sintel_{dstype}_5px": float((epe_all > 5).mean()),
    }
    if with_speed_metric:
        out[f"sintel_{dstype}_s0_10"] = float(np.concatenate(s010).mean()) if s010 else 0.0
        out[f"sintel_{dstype}_s10_40"] = float(np.concatenate(s1040).mean()) if s1040 else 0.0
        out[f"sintel_{dstype}_s40+"] = float(np.concatenate(s40).mean()) if s40 else 0.0
    if evaluate_matched_unmatched and matched:
        out[f"sintel_{dstype}_matched_epe"] = float(np.concatenate(matched).mean())
        out[f"sintel_{dstype}_unmatched_epe"] = float(np.concatenate(unmatched).mean())
    if count_time and num_timed:
        out["time_per_pair_ms"] = 1000.0 * total_time / num_timed
    return out


def validate_kitti(model, params, infer: InferenceConfig, root: str = "datasets/KITTI",
                   padding_factor: int = 8,
                   with_speed_metric: bool = False,
                   average_over_pixels: bool = True,
                   count_time: bool = False,
                   inference_size: Optional[Tuple[int, int]] = None) -> Dict[str, float]:
    """KITTI-2015 train-split validation.

    Metric contract of reference evaluate_flow.py:498-617: mode='kitti'
    padding (bottom-only height pad), F1 outliers concatenated per-pixel over
    the whole split; EPE per-pixel (default) or per-image mean; optional
    s0-10 / s10-40 / s40+ speed buckets over valid sparse-GT pixels.
    """
    from unimatch_tpu.data.flow_datasets import KITTI

    ds = require_samples(KITTI(aug_params=None, split="training", root=root), root)
    fwd = _jit_flow(model, infer)
    epe_list, out_list = [], []
    s010, s1040, s40 = [], [], []
    total_time, num_timed = 0.0, 0
    for i in range(len(ds)):
        s = ds[i]
        if count_time and i >= 5:
            t0 = time.perf_counter()
        flow = _run_padded(fwd, params, s["img0"], s["img1"], padding_factor,
                           inference_size, padder_mode="kitti")
        if count_time and i >= 5:
            total_time += time.perf_counter() - t0
            num_timed += 1
        gt = s["flow_gt"]
        valid = s["valid"] >= 0.5
        epe = np.sqrt(((flow - gt) ** 2).sum(-1))
        mag = np.sqrt((gt**2).sum(-1))
        if with_speed_metric:
            m = (mag < 10) & valid
            if m.any():
                s010.append(epe[m])
            m = (mag >= 10) & (mag <= 40) & valid
            if m.any():
                s1040.append(epe[m])
            m = (mag > 40) & valid
            if m.any():
                s40.append(epe[m])
        with np.errstate(divide="ignore", invalid="ignore"):
            out = ((epe > 3.0) & ((epe / mag) > 0.05)).astype(np.float32)
        if average_over_pixels:
            epe_list.append(epe[valid].reshape(-1))
        else:
            epe_list.append(epe[valid].mean())
        out_list.append(out[valid].reshape(-1))

    epe_all = np.concatenate(epe_list) if average_over_pixels else np.array(epe_list)
    results = {
        "kitti_epe": float(epe_all.mean()),
        "kitti_f1": float(100.0 * np.concatenate(out_list).mean()),
    }
    if with_speed_metric:
        results["kitti_s0_10"] = float(np.concatenate(s010).mean()) if s010 else 0.0
        results["kitti_s10_40"] = float(np.concatenate(s1040).mean()) if s1040 else 0.0
        results["kitti_s40+"] = float(np.concatenate(s40).mean()) if s40 else 0.0
    if count_time and num_timed:
        results["time_per_pair_ms"] = 1000.0 * total_time / num_timed
    return results


def create_sintel_submission(model, params, infer: InferenceConfig, root: str = "datasets/Sintel",
                             output_path: str = "sintel_submission", padding_factor: int = 8,
                             save_vis_flow: bool = False, no_save_flo: bool = False,
                             inference_size: Optional[Tuple[int, int]] = None) -> None:
    from unimatch_tpu.data.flow_datasets import MpiSintel
    from unimatch_tpu.utils.flow_viz import save_vis_flow_tofile

    fwd = _jit_flow(model, infer)
    for dstype in ("clean", "final"):
        ds = require_samples(MpiSintel(aug_params=None, split="test", dstype=dstype, root=root), root)
        for i in range(len(ds)):
            s = ds[i]
            scene, frame_id = s["extra"]
            flow = _run_padded(fwd, params, s["img0"], s["img1"], padding_factor, inference_size)
            out_dir = os.path.join(output_path, dstype, scene)
            os.makedirs(out_dir, exist_ok=True)
            if not no_save_flo:
                frame_utils.write_flo(os.path.join(out_dir, "frame%04d.flo" % (frame_id + 1)), flow)
            if save_vis_flow:  # reference evaluate_flow.py:74-78: colorized png instead
                save_vis_flow_tofile(flow, os.path.join(out_dir, "frame%04d.png" % (frame_id + 1)))


def create_kitti_submission(model, params, infer: InferenceConfig, root: str = "datasets/KITTI",
                            output_path: str = "kitti_submission", padding_factor: int = 8,
                            save_vis_flow: bool = False,
                            inference_size: Optional[Tuple[int, int]] = None) -> None:
    from unimatch_tpu.data.flow_datasets import KITTI
    from unimatch_tpu.utils.flow_viz import save_vis_flow_tofile

    ds = require_samples(KITTI(aug_params=None, split="testing", root=root), root)
    fwd = _jit_flow(model, infer)
    os.makedirs(output_path, exist_ok=True)
    for i in range(len(ds)):
        s = ds[i]
        (frame_id,) = s["extra"]
        flow = _run_padded(fwd, params, s["img0"], s["img1"], padding_factor,
                           inference_size, padder_mode="kitti")  # reference evaluate_flow.py:125
        if save_vis_flow:
            save_vis_flow_tofile(flow, os.path.join(output_path, frame_id))
        else:
            frame_utils.write_kitti_flow_png(os.path.join(output_path, frame_id), flow)
