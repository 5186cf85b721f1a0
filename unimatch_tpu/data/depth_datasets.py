"""Two-view posed depth datasets and augmentation (CPU, torch-free).

Capability parity with reference dataloader/depth/:
  ScannetDataset  datasets.py:11-117  (BA-Net split txt files; poses are
                  cam-to-world; relative pose = inv(pose_tgt) @ pose_ref;
                  depth png / 1000; images resized to depth's 640x480)
  DemonDataset    datasets.py:120-201 (npy depth, poses.txt rows [3x4])
  augmentation    augmentation.py — dict transforms that jointly handle
                  img_ref/img_tgt/depth/valid/intrinsics; RandomCrop adjusts
                  cx,cy (:66-93); RandomResize scales fx,fy,cx,cy (:124-175);
                  photometric set with 20%-asymmetric target jitter.

Samples are numpy dicts:
  {"img0" (ref), "img1" (tgt): [H,W,3] f32 ImageNet-normalized,
   "depth_gt": [H,W], "valid": [H,W], "intrinsics": [3,3], "pose": [4,4]}
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import List, Optional

import numpy as np

from unimatch_tpu.data.rng import get_rng

from unimatch_tpu.data import color_jitter as CJ
from unimatch_tpu.data.transforms_stereo import IMAGENET_MEAN, IMAGENET_STD
from unimatch_tpu.utils import frame_utils


class Compose:
    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class NormalizeImages:
    """[0,255] -> ImageNet-normalized float (ToTensor+Normalize equivalent)."""

    def __call__(self, sample):
        for k in ("img_ref", "img_tgt"):
            sample[k] = (sample[k].astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        return sample


class RandomCrop:
    """Crop jointly; shift principal point by the crop offset (reference :66-93)."""

    def __init__(self, crop_size):
        self.crop_size = crop_size

    def __call__(self, sample):
        ch, cw = self.crop_size
        oh, ow = sample["img_ref"].shape[:2]
        y0 = get_rng().randint(oh - ch + 1)
        x0 = get_rng().randint(ow - cw + 1)
        for k in ("img_ref", "img_tgt", "depth", "valid"):
            if k in sample:
                sample[k] = sample[k][y0 : y0 + ch, x0 : x0 + cw]
        K = sample["intrinsics"].copy()
        K[0, 2] -= x0
        K[1, 2] -= y0
        sample["intrinsics"] = K
        return sample


class RandomResize:
    """Scale+stretch; scales fx,fy,cx,cy accordingly (reference :124-175)."""

    def __init__(self, min_size, min_scale=-0.2, max_scale=0.2):
        self.min_size = min_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.stretch_prob = 0.4
        self.max_stretch = 0.2

    def __call__(self, sample):
        import cv2

        if get_rng().random() < 0.5:
            mh, mw = self.min_size
            oh, ow = sample["img_ref"].shape[:2]
            min_scale = max(mh / float(oh), mw / float(ow))
            scale = 2 ** get_rng().uniform(self.min_scale, self.max_scale)
            sx = sy = scale
            if get_rng().random() < self.stretch_prob:
                sx *= 2 ** get_rng().uniform(-self.max_stretch, self.max_stretch)
                sy *= 2 ** get_rng().uniform(-self.max_stretch, self.max_stretch)
            sx, sy = max(sx, min_scale), max(sy, min_scale)

            for k in ("img_ref", "img_tgt", "depth"):
                sample[k] = cv2.resize(sample[k], None, fx=sx, fy=sy, interpolation=cv2.INTER_LINEAR)
            if "valid" in sample:
                v = cv2.resize(sample["valid"], None, fx=sx, fy=sy, interpolation=cv2.INTER_LINEAR)
                sample["valid"] = (v > 0.99).astype(np.float32)
            K = sample["intrinsics"].copy()
            K[0] *= sx
            K[1] *= sy
            sample["intrinsics"] = K
        return sample


def _adjust_gamma(img, gamma):
    return np.clip(255.0 * (np.asarray(img, np.float32) / 255.0) ** gamma, 0, 255).astype(np.uint8)


class RandomColorDepth:
    """Photometric jitter; target re-samples its parameter 20% of the time."""

    _OPS = [
        (lambda: get_rng().uniform(0.8, 1.2), CJ.adjust_contrast),
        (lambda: get_rng().uniform(0.7, 1.5), _adjust_gamma),
        (lambda: get_rng().uniform(0.5, 2.0), CJ.adjust_brightness),
        (lambda: get_rng().uniform(-0.1, 0.1), CJ.adjust_hue),
        (lambda: get_rng().uniform(0.8, 1.2), CJ.adjust_saturation),
    ]

    def __init__(self, asymmetric=True):
        self.asymmetric = asymmetric

    def __call__(self, sample):
        ref = sample["img_ref"].astype(np.uint8)
        tgt = sample["img_tgt"].astype(np.uint8)
        R = get_rng()
        ops = list(self._OPS)
        if R.random() < 0.5:
            ops = [ops[R.randint(len(ops))]]
        else:
            ops = [ops[i] for i in R.permutation(len(ops))]
        for sample_param, apply in ops:
            if get_rng().random() < 0.5:
                p = sample_param()
                ref = apply(ref, p)
                if self.asymmetric and get_rng().random() < 0.2:
                    p = sample_param()
                tgt = apply(tgt, p)
        sample["img_ref"] = ref.astype(np.float32)
        sample["img_tgt"] = tgt.astype(np.float32)
        return sample


class ScannetDataset:
    """BA-Net ScanNet two-view split (reference datasets.py:11-117)."""

    def __init__(self, data_dir="datasets/Scannet", mode="train", transforms=None,
                 return_filename=False, split_file: Optional[str] = None):
        assert mode in ("train", "test", "demo")
        self.transforms = transforms
        self.return_filename = return_filename
        self.samples: List = []

        split_file = split_file or osp.join(
            osp.dirname(osp.abspath(__file__)), f"scannet_banet_{mode}_pairs.txt"
        )
        with open(split_file) as f:
            pairs = [line.rstrip() for line in f]

        for pair in pairs:
            scene_name, ref_id, tgt_id = pair.split(" ")
            scene = osp.join(data_dir, mode, scene_name)
            paths = (
                osp.join(scene, "color", ref_id + ".jpg"),
                osp.join(scene, "color", tgt_id + ".jpg"),
                osp.join(scene, "pose", ref_id + ".txt"),
                osp.join(scene, "pose", tgt_id + ".txt"),
                osp.join(scene, "depth", ref_id + ".png"),
                osp.join(scene, "intrinsic", "intrinsic_depth.txt"),
            )
            if all(osp.isfile(p) for p in paths):
                self.samples.append(paths)

    def __len__(self):
        return len(self.samples)

    def __rmul__(self, v):
        self.samples = v * self.samples
        return self

    def __getitem__(self, i):
        from PIL import Image

        img_ref_p, img_tgt_p, pose_ref_p, pose_tgt_p, depth_p, K_p = self.samples[i]
        # images resized to the depth map's 640x480
        img_ref = np.asarray(Image.open(img_ref_p).resize((640, 480)), np.float32)
        img_tgt = np.asarray(Image.open(img_tgt_p).resize((640, 480)), np.float32)
        depth = np.asarray(Image.open(depth_p), np.float32) / 1000.0
        valid = (depth > 0).astype(np.float32)

        pose_ref = np.loadtxt(pose_ref_p).astype(np.float32).reshape(4, 4)  # cam-to-world
        pose_tgt = np.loadtxt(pose_tgt_p).astype(np.float32).reshape(4, 4)
        pose = np.linalg.inv(pose_tgt) @ pose_ref

        K = np.loadtxt(K_p).astype(np.float32).reshape(4, 4)[:3, :3]

        sample = {
            "img_ref": img_ref, "img_tgt": img_tgt, "intrinsics": K,
            "pose": pose, "depth": depth, "valid": valid,
        }
        if self.transforms is not None:
            sample = self.transforms(sample)
        out = {
            "img0": sample["img_ref"], "img1": sample["img_tgt"],
            "depth_gt": sample["depth"], "valid": sample["valid"],
            "intrinsics": sample["intrinsics"], "pose": sample["pose"],
        }
        if self.return_filename:
            out["filenames"] = (img_ref_p, img_tgt_p)
        return out


class DemonDataset:
    """DeMoN two-view dataset (reference datasets.py:120-201)."""

    def __init__(self, data_dir="datasets/Demon", mode="train", transforms=None,
                 split: str = None):
        """`split` filters scenes by source sub-dataset (rgbd/sun3d/scenes11/mvs),
        matching the reference's --demon_split (main_depth.py:39)."""
        data_dir = osp.join(data_dir, "test" if "test" in mode else "train")
        self.transforms = transforms
        self.samples: List = []

        scenes = [
            osp.join(data_dir, d)
            for d in sorted(os.listdir(data_dir))
            if osp.isdir(osp.join(data_dir, d)) and mode in d
            and (split is None or d.startswith(split))
        ]
        for scene in scenes:
            K = np.genfromtxt(osp.join(scene, "cam.txt")).astype(np.float32).reshape(3, 3)
            poses = np.genfromtxt(osp.join(scene, "poses.txt")).astype(np.float32)
            imgs = sorted(glob(osp.join(scene, "*.jpg")))
            if len(imgs) < 2:
                continue
            for i in range(len(imgs)):
                # two-view pairing (sequence_length=2): frame 0 pairs forward,
                # every other frame pairs with its previous neighbor
                j = 1 if i == 0 else i - 1
                depth = imgs[i][:-4] + ".npy"
                pose_ref = np.concatenate([poses[i].reshape(3, 4), [[0, 0, 0, 1]]], axis=0)
                pose_tgt = np.concatenate([poses[j].reshape(3, 4), [[0, 0, 0, 1]]], axis=0)
                pose = (pose_tgt @ np.linalg.inv(pose_ref)).astype(np.float32)
                self.samples.append((imgs[i], imgs[j], pose, depth, K))

    def __len__(self):
        return len(self.samples)

    def __rmul__(self, v):
        self.samples = v * self.samples
        return self

    def __getitem__(self, i):
        img_ref_p, img_tgt_p, pose, depth_p, K = self.samples[i]
        img_ref = frame_utils.read_image(img_ref_p)
        img_tgt = frame_utils.read_image(img_tgt_p)
        depth = np.load(depth_p)
        valid = (depth > 0).astype(np.float32)
        sample = {
            "img_ref": img_ref, "img_tgt": img_tgt, "intrinsics": K.copy(),
            "pose": pose, "depth": depth, "valid": valid,
        }
        if self.transforms is not None:
            sample = self.transforms(sample)
        return {
            "img0": sample["img_ref"], "img1": sample["img_tgt"],
            "depth_gt": sample["depth"], "valid": sample["valid"],
            "intrinsics": sample["intrinsics"], "pose": sample["pose"],
        }


def build_depth_train_transforms(crop_size=(480, 640), min_size=(480, 640)):
    """Default ScanNet training augmentation chain."""
    return Compose(
        [
            RandomResize(min_size=min_size),
            RandomCrop(crop_size),
            RandomColorDepth(asymmetric=True),
            NormalizeImages(),
        ]
    )
