"""End-user inference pipelines for flow / stereo / depth.

Capability parity with the reference's inference entry points:
  inference_flow    evaluate_flow.py:642-831 (dir of frames or video,
                    padding-or-resize adaptation, optional bidirectional flow
                    + forward/backward occlusion check, .flo + color viz out)
  inference_stereo  evaluate_stereo.py:712-843
  inference_depth   evaluate_depth.py:296-419 (ScanNet-style dir layout)

TPU-first: each distinct padded shape compiles once (jit cache keyed on
shape); pre/post-processing (pad, normalize, resize-rescale) runs on device.
"""

from __future__ import annotations

import glob
import os
from typing import List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from unimatch_tpu.config import InferenceConfig
from unimatch_tpu.data.padder import InputPadder
from unimatch_tpu.models.unimatch import UniMatch
from unimatch_tpu.ops import geometry as G
from unimatch_tpu.utils import frame_utils
from unimatch_tpu.utils.flow_viz import save_vis_flow_tofile


def _jit_forward(model: UniMatch, infer: InferenceConfig, **static_kwargs):
    @jax.jit
    def fwd(params, img0, img1, *extra):
        kwargs = {}
        if extra:
            kwargs = {"intrinsics": extra[0], "pose": extra[1]}
        return model.apply(params, img0, img1, infer=infer, **static_kwargs, **kwargs)[
            "flow_preds"
        ][-1]

    return fwd


def _resize_or_pad(img0, img1, padding_factor: int, inference_size: Optional[Tuple[int, int]]):
    """Returns (img0, img1, padder_or_None, original_hw)."""
    ori_hw = img0.shape[1:3]
    if inference_size is None:
        padder = InputPadder(img0.shape, padding_factor=padding_factor)
        img0, img1 = padder.pad(img0, img1)
        return img0, img1, padder, ori_hw
    img0 = G.resize_bilinear_align_corners(img0, *inference_size)
    img1 = G.resize_bilinear_align_corners(img1, *inference_size)
    return img0, img1, None, ori_hw


def _restore_flow(flow, padder, ori_hw):
    """Unpad, or resize back with flow-magnitude rescaling (reference :66-71)."""
    if padder is not None:
        return padder.unpad(flow)
    h, w = ori_hw
    ih, iw = flow.shape[1:3]
    flow = G.resize_bilinear_align_corners(flow, h, w)
    scale = jnp.asarray([w / iw, h / ih], flow.dtype)
    return flow * scale


def inference_flow(
    model: UniMatch,
    params,
    infer: InferenceConfig,
    inference_dir: Optional[str] = None,
    inference_video: Optional[str] = None,
    output_path: str = "output",
    padding_factor: int = 8,
    inference_size: Optional[Tuple[int, int]] = None,
    pred_bidir_flow: bool = False,
    pred_bwd_flow: bool = False,
    fwd_bwd_consistency_check: bool = False,
    save_flo_flow: bool = False,
    save_video: bool = False,
    concat_flow_img: bool = False,
) -> List[str]:
    """Run flow on consecutive frame pairs from a directory or video.

    Returns the list of written files.
    """
    if fwd_bwd_consistency_check:
        assert pred_bidir_flow

    os.makedirs(output_path, exist_ok=True)
    written: List[str] = []

    if inference_video is not None:
        frames = extract_video_frames(inference_video)  # list of [H, W, 3] uint8
        filenames = [f"frame_{i:04d}" for i in range(len(frames))]
        images = [f.astype(np.float32) for f in frames]
    else:
        paths = sorted(
            sum((glob.glob(os.path.join(inference_dir, e)) for e in ("*.png", "*.jpg", "*.jpeg")), [])
        )
        filenames = [os.path.splitext(os.path.basename(p))[0] for p in paths]
        images = [frame_utils.read_image(p) for p in paths]

    fwd = _jit_forward(model, infer, pred_bidir_flow=pred_bidir_flow)

    video_frames = []
    for i in range(len(images) - 1):
        img0 = jnp.asarray(images[i])[None]
        img1 = jnp.asarray(images[i + 1])[None]
        if pred_bwd_flow:  # reference evaluate_flow.py:735-736: swap the pair
            img0, img1 = img1, img0

        # portrait-orientation trick: run transposed (reference :714-717)
        transpose = img0.shape[1] > img0.shape[2]
        if transpose:
            img0 = jnp.swapaxes(img0, 1, 2)
            img1 = jnp.swapaxes(img1, 1, 2)

        img0p, img1p, padder, ori_hw = _resize_or_pad(img0, img1, padding_factor, inference_size)
        flow_pr = fwd(params, img0p, img1p)  # [B(,2B), H, W, 2]
        flow = _restore_flow(flow_pr, padder, ori_hw)

        if transpose:
            # swap spatial dims back and the flow (x, y) components
            flow = jnp.swapaxes(flow, 1, 2)[..., ::-1]

        flow_np = np.asarray(flow[0], np.float32)
        base = os.path.join(output_path, filenames[i])

        vis_path = base + "_flow.png"
        save_vis_flow_tofile(flow_np, vis_path)
        written.append(vis_path)
        if save_video:
            from unimatch_tpu.utils.flow_viz import flow_to_image

            vis = flow_to_image(flow_np)
            if concat_flow_img:
                vis = np.concatenate([images[i].astype(np.uint8), vis], axis=0)
            video_frames.append(vis)

        if save_flo_flow:
            flo_path = base + "_pred.flo"
            frame_utils.write_flo(flo_path, flow_np)
            written.append(flo_path)

        if pred_bidir_flow:
            bwd_path = base + "_flow_bwd.png"
            save_vis_flow_tofile(np.asarray(flow[1], np.float32), bwd_path)
            written.append(bwd_path)
            if fwd_bwd_consistency_check:
                fwd_occ, bwd_occ = G.forward_backward_consistency_check(flow[:1], flow[1:2])
                from PIL import Image

                for occ, suffix in ((fwd_occ, "_occ_fwd.png"), (bwd_occ, "_occ_bwd.png")):
                    occ_path = base + suffix
                    Image.fromarray(
                        (np.asarray(occ[0]) * 255).astype(np.uint8)
                    ).save(occ_path)
                    written.append(occ_path)

    if save_video and video_frames:
        import imageio

        out_video = os.path.join(output_path, "flow.mp4")
        imageio.mimwrite(out_video, video_frames, fps=10, quality=8)
        written.append(out_video)

    return written


def extract_video_frames(path: str) -> List[np.ndarray]:
    """Decode a video into RGB frames (reference utils/file_io.py:203-224)."""
    import imageio

    reader = imageio.get_reader(path)
    frames = [np.asarray(frame) for frame in reader]
    reader.close()
    return frames


def inference_stereo(
    model: UniMatch,
    params,
    infer: InferenceConfig,
    inference_dir: Optional[str] = None,
    inference_dir_left: Optional[str] = None,
    inference_dir_right: Optional[str] = None,
    output_path: str = "output",
    padding_factor: int = 32,
    inference_size: Optional[Tuple[int, int]] = None,
    pred_bidir_disp: bool = False,
    pred_right_disp: bool = False,
    save_pfm_disp: bool = False,
) -> List[str]:
    """Stereo disparity on left/right pairs (reference evaluate_stereo.py:712-843)."""
    os.makedirs(output_path, exist_ok=True)

    if inference_dir is not None:
        paths = sorted(
            sum((glob.glob(os.path.join(inference_dir, e)) for e in ("*.png", "*.jpg")), [])
        )
        assert len(paths) % 2 == 0, "inference_dir must contain left/right pairs"
        left_paths, right_paths = paths[0::2], paths[1::2]
    else:
        left_paths = sorted(
            sum((glob.glob(os.path.join(inference_dir_left, e)) for e in ("*.png", "*.jpg")), [])
        )
        right_paths = sorted(
            sum((glob.glob(os.path.join(inference_dir_right, e)) for e in ("*.png", "*.jpg")), [])
        )

    mean = jnp.asarray([0.485, 0.456, 0.406]) * 255
    std = jnp.asarray([0.229, 0.224, 0.225]) * 255

    fwd = _jit_forward(model, infer)
    written: List[str] = []

    for i, (lp, rp) in enumerate(zip(left_paths, right_paths)):
        left = (jnp.asarray(frame_utils.read_image(lp))[None] - mean) / std
        right = (jnp.asarray(frame_utils.read_image(rp))[None] - mean) / std

        if pred_bidir_disp:
            # horizontally flip to predict right-view disparity in one batch
            left, right = (
                jnp.concatenate([left, right[:, :, ::-1]], axis=0),
                jnp.concatenate([right, left[:, :, ::-1]], axis=0),
            )
        elif pred_right_disp:
            left, right = right[:, :, ::-1], left[:, :, ::-1]

        ori_hw = left.shape[1:3]
        if inference_size is None:
            padder = InputPadder(left.shape, padding_factor=padding_factor)
            left, right = padder.pad(left, right)
        else:
            left = G.resize_bilinear_align_corners(left, *inference_size)
            right = G.resize_bilinear_align_corners(right, *inference_size)

        disp = fwd(params, left, right)  # [B, H, W]

        if inference_size is None:
            disp = padder.unpad(disp)
        else:
            h, w = ori_hw
            disp = G.resize_bilinear_align_corners(disp[..., None], h, w)[..., 0]
            disp = disp * (w / inference_size[1])

        if pred_right_disp or pred_bidir_disp:
            disp = disp.at[-1].set(disp[-1, :, ::-1]) if pred_bidir_disp else disp[:, :, ::-1]

        base = os.path.join(output_path, f"{os.path.splitext(os.path.basename(lp))[0]}")
        disp_np = np.asarray(disp[0], np.float32)

        from unimatch_tpu.utils.visualization import vis_disparity
        from PIL import Image

        vis_path = base + "_disp.png"
        Image.fromarray(vis_disparity(disp_np)).save(vis_path)
        written.append(vis_path)
        if save_pfm_disp:
            pfm_path = base + "_disp.pfm"
            frame_utils.write_pfm(pfm_path, disp_np)
            written.append(pfm_path)

    return written


def inference_depth(
    model: UniMatch,
    params,
    infer: InferenceConfig,
    inference_dir: str,
    output_path: str = "output",
    padding_factor: int = 16,
    depth_from_argmax: bool = False,
    pred_bidir_depth: bool = False,
) -> List[str]:
    """Two-view posed depth on a ScanNet-style directory:
    color/*.png|jpg, pose/*.txt (cam-to-world), intrinsic/intrinsic_depth.txt.
    Reference evaluate_depth.py:296-419.
    """
    os.makedirs(output_path, exist_ok=True)

    color_paths = sorted(
        sum((glob.glob(os.path.join(inference_dir, "color", e)) for e in ("*.png", "*.jpg")), [])
    )
    pose_paths = sorted(glob.glob(os.path.join(inference_dir, "pose", "*.txt")))
    intrinsics = np.loadtxt(os.path.join(inference_dir, "intrinsic", "intrinsic_depth.txt")).astype(
        np.float32
    )[:3, :3]

    mean = jnp.asarray([0.485, 0.456, 0.406]) * 255
    std = jnp.asarray([0.229, 0.224, 0.225]) * 255

    fwd = _jit_forward(model, infer, pred_bidir_depth=pred_bidir_depth)
    written: List[str] = []

    for i in range(len(color_paths) - 1):
        img_ref = frame_utils.read_image(color_paths[i])
        img_tgt = frame_utils.read_image(color_paths[i + 1])
        pose_ref = np.loadtxt(pose_paths[i]).astype(np.float32)  # cam-to-world
        pose_tgt = np.loadtxt(pose_paths[i + 1]).astype(np.float32)
        # relative pose ref->tgt (reference evaluate_depth.py:347-350)
        pose_rel = np.linalg.inv(pose_tgt) @ pose_ref

        h0, w0 = img_ref.shape[:2]
        # resize to nearest padding-factor multiple, scaling intrinsics
        h = int(np.round(h0 / padding_factor)) * padding_factor
        w = int(np.round(w0 / padding_factor)) * padding_factor
        K = intrinsics.copy()
        K[0] *= w / w0
        K[1] *= h / h0

        ref_j = (G.resize_bilinear_align_corners(jnp.asarray(img_ref)[None], h, w) - mean) / std
        tgt_j = (G.resize_bilinear_align_corners(jnp.asarray(img_tgt)[None], h, w) - mean) / std

        depth = fwd(params, ref_j, tgt_j, jnp.asarray(K)[None], jnp.asarray(pose_rel)[None])

        base = os.path.join(output_path, os.path.splitext(os.path.basename(color_paths[i]))[0])
        from unimatch_tpu.utils.visualization import viz_depth_tensor
        from PIL import Image

        depth_np = np.asarray(depth[0], np.float32)
        vis_path = base + "_depth.png"
        Image.fromarray(viz_depth_tensor(depth_np)).save(vis_path)
        written.append(vis_path)
        np.save(base + "_depth.npy", depth_np)
        written.append(base + "_depth.npy")

    return written
