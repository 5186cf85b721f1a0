"""Optical-flow datasets and training-stage recipes (CPU, torch-free).

Capability parity with reference dataloader/flow/datasets.py: FlowDataset
base (:19-137), MpiSintel :140, FlyingChairs :172, FlyingThings3D :192,
VKITTI2 :242, KITTI :278, KITTI12 :300, HD1K :320, and the
`build_train_dataset` stage recipes :339-406 (chairs / things / vkitti2 /
sintel / sintel_ft / kitti / kitti_mix) with the same weighted mixes.

Samples are plain numpy dicts:
  {"img0": [H,W,3] f32(0..255), "img1": ..., "flow_gt": [H,W,2] f32,
   "valid": [H,W] f32}  (+ "noc_valid" when occlusion maps are loaded)
Weighted mixing uses `k * ds` / `ds_a + ds_b` like the reference.
"""

from __future__ import annotations

import os
import os.path as osp
from glob import glob
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

from unimatch_tpu.data.transforms_flow import FlowAugmentor, SparseFlowAugmentor
from unimatch_tpu.utils import frame_utils


def read_vkitti2_flow(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """VKITTI2 16-bit png flow: x/y normalized to [0, 2^16-1], B==0 invalid."""
    import cv2

    bgr = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    h, w, _ = bgr.shape
    invalid = bgr[:, :, 0] == 0
    flow = 2.0 / (2**16 - 1.0) * bgr[:, :, 2:0:-1].astype(np.float32) - 1
    flow[..., 0] *= w - 1
    flow[..., 1] *= h - 1
    # invalid (sky) set to tiny value so it still receives supervision
    flow[invalid] = 1e-6
    valid = np.ones((h, w), np.float32)
    return flow, valid


class FlowDataset:
    """Base: file lists + augmentation; subclasses fill the lists."""

    def __init__(self, aug_params=None, sparse=False, load_occlusion=False, vkitti2=False):
        self.augmentor = None
        if aug_params is not None:
            self.augmentor = (
                SparseFlowAugmentor(**aug_params) if sparse else FlowAugmentor(**aug_params)
            )
        self.sparse = sparse
        self.vkitti2 = vkitti2
        self.load_occlusion = load_occlusion
        self.is_test = False
        self.image_list: List[List[str]] = []
        self.flow_list: List[str] = []
        self.occ_list: List[str] = []
        self.extra_info: List = []

    def __len__(self):
        return len(self.image_list)

    def __rmul__(self, v: int):
        self.image_list = v * self.image_list
        self.flow_list = v * self.flow_list
        self.occ_list = v * self.occ_list
        self.extra_info = v * self.extra_info
        return self

    def __add__(self, other: "FlowDataset"):
        return ConcatFlowDataset([self, other])

    def _read_images(self, index) -> Tuple[np.ndarray, np.ndarray]:
        img0 = np.asarray(frame_utils.read_image(self.image_list[index][0]), np.uint8)
        img1 = np.asarray(frame_utils.read_image(self.image_list[index][1]), np.uint8)
        return img0, img1

    def __getitem__(self, index) -> Dict[str, np.ndarray]:
        index = index % len(self.image_list)
        img0, img1 = self._read_images(index)

        if self.is_test:
            return {
                "img0": img0.astype(np.float32),
                "img1": img1.astype(np.float32),
                "extra": self.extra_info[index],
            }

        valid = None
        if self.sparse:
            if self.vkitti2:
                flow, valid = read_vkitti2_flow(self.flow_list[index])
            else:
                flow, valid = frame_utils.read_kitti_flow_png(self.flow_list[index])
        else:
            flow = np.asarray(frame_utils.read_gen(self.flow_list[index]), np.float32)
            if flow.ndim == 3 and flow.shape[-1] == 3:  # pfm with 3 channels
                flow = flow[..., :2]

        occlusion = None
        if self.load_occlusion:
            occlusion = np.asarray(frame_utils.read_gen(self.occ_list[index]), np.float32)
            if occlusion.ndim == 3:
                occlusion = occlusion[..., 0]

        if self.augmentor is not None:
            if self.sparse:
                img0, img1, flow, valid = self.augmentor(img0, img1, flow, valid)
            elif occlusion is not None:
                img0, img1, flow, occlusion = self.augmentor(img0, img1, flow, occlusion)
            else:
                img0, img1, flow = self.augmentor(img0, img1, flow)

        if valid is None:
            valid = ((np.abs(flow[..., 0]) < 1000) & (np.abs(flow[..., 1]) < 1000)).astype(
                np.float32
            )

        out = {
            "img0": img0.astype(np.float32),
            "img1": img1.astype(np.float32),
            "flow_gt": flow.astype(np.float32),
            "valid": np.asarray(valid, np.float32),
        }
        if occlusion is not None:
            out["noc_valid"] = 1.0 - occlusion / 255.0
        return out


class ConcatFlowDataset:
    def __init__(self, datasets: Sequence):
        self.datasets = []
        for d in datasets:
            if isinstance(d, ConcatFlowDataset):
                self.datasets.extend(d.datasets)
            else:
                self.datasets.append(d)
        self._lengths = [len(d) for d in self.datasets]
        self._cum = np.cumsum(self._lengths)

    def __len__(self):
        return int(self._cum[-1])

    def __add__(self, other):
        return ConcatFlowDataset([self, other])

    def __getitem__(self, index):
        ds_idx = int(np.searchsorted(self._cum, index, side="right"))
        prev = 0 if ds_idx == 0 else int(self._cum[ds_idx - 1])
        return self.datasets[ds_idx][index - prev]


class MpiSintel(FlowDataset):
    def __init__(self, aug_params=None, split="training", root="datasets/Sintel", dstype="clean",
                 load_occlusion=False):
        super().__init__(aug_params, load_occlusion=load_occlusion)
        image_root = osp.join(root, split, dstype)
        flow_root = osp.join(root, split, "flow")
        occ_root = osp.join(root, split, "occlusions")
        if split == "test":
            self.is_test = True
        for scene in sorted(os.listdir(image_root)):
            images = sorted(glob(osp.join(image_root, scene, "*.png")))
            for i in range(len(images) - 1):
                self.image_list.append([images[i], images[i + 1]])
                self.extra_info.append((scene, i))
            if split != "test":
                self.flow_list += sorted(glob(osp.join(flow_root, scene, "*.flo")))
                if load_occlusion:
                    self.occ_list += sorted(glob(osp.join(occ_root, scene, "*.png")))


class FlyingChairs(FlowDataset):
    def __init__(self, aug_params=None, split="training", root="datasets/FlyingChairs_release/data",
                 split_file: Optional[str] = None):
        super().__init__(aug_params)
        images = sorted(glob(osp.join(root, "*.ppm")))
        flows = sorted(glob(osp.join(root, "*.flo")))
        assert len(images) // 2 == len(flows)
        split_file = split_file or osp.join(osp.dirname(osp.abspath(__file__)), "chairs_split.txt")
        split_ids = np.loadtxt(split_file, dtype=np.int32)
        for i in range(len(flows)):
            if (split == "training" and split_ids[i] == 1) or (
                split == "validation" and split_ids[i] == 2
            ):
                self.flow_list.append(flows[i])
                self.image_list.append([images[2 * i], images[2 * i + 1]])


class FlyingThings3D(FlowDataset):
    def __init__(self, aug_params=None, root="datasets/FlyingThings3D",
                 dstype="frames_cleanpass", test_set=False, validate_subset=True):
        super().__init__(aug_params)
        split = "TEST" if test_set else "TRAIN"
        for cam in ["left"]:
            for direction in ["into_future", "into_past"]:
                image_dirs = sorted(glob(osp.join(root, dstype, split, "*/*")))
                image_dirs = sorted(osp.join(f, cam) for f in image_dirs)
                flow_dirs = sorted(glob(osp.join(root, "optical_flow", split, "*/*")))
                flow_dirs = sorted(osp.join(f, direction, cam) for f in flow_dirs)
                for idir, fdir in zip(image_dirs, flow_dirs):
                    images = sorted(glob(osp.join(idir, "*.png")))
                    flows = sorted(glob(osp.join(fdir, "*.pfm")))
                    for i in range(len(flows) - 1):
                        if direction == "into_future":
                            self.image_list.append([images[i], images[i + 1]])
                            self.flow_list.append(flows[i])
                        else:
                            self.image_list.append([images[i + 1], images[i]])
                            self.flow_list.append(flows[i + 1])
        if test_set and validate_subset:
            num_val = 1024
            total = len(self.image_list)
            stride = total // num_val
            remove = total % num_val
            self.image_list = self.image_list[: total - remove][::stride]
            self.flow_list = self.flow_list[: total - remove][::stride]


class VKITTI2(FlowDataset):
    def __init__(self, aug_params=None, root="datasets/VKITTI2"):
        super().__init__(aug_params, sparse=True, vkitti2=True)
        for scene in ["Scene01", "Scene02", "Scene06", "Scene18", "Scene20"]:
            scene_dir = osp.join(root, scene)
            for scene_type in sorted(os.listdir(scene_dir)):
                type_dir = osp.join(scene_dir, scene_type)
                imgs = sorted(glob(osp.join(type_dir, "frames", "rgb", "Camera_0", "*.jpg")))
                fwd = sorted(glob(osp.join(type_dir, "frames", "forwardFlow", "Camera_0", "*.png")))
                bwd = sorted(glob(osp.join(type_dir, "frames", "backwardFlow", "Camera_0", "*.png")))
                for i in range(len(imgs) - 1):
                    self.image_list.append([imgs[i], imgs[i + 1]])
                    self.flow_list.append(fwd[i])
                    self.image_list.append([imgs[i + 1], imgs[i]])
                    self.flow_list.append(bwd[i])


class KITTI(FlowDataset):
    def __init__(self, aug_params=None, split="training", root="datasets/KITTI"):
        super().__init__(aug_params, sparse=True)
        if split == "testing":
            self.is_test = True
        root = osp.join(root, split)
        images1 = sorted(glob(osp.join(root, "image_2/*_10.png")))
        images2 = sorted(glob(osp.join(root, "image_2/*_11.png")))
        for i1, i2 in zip(images1, images2):
            self.extra_info.append([osp.basename(i1)])
            self.image_list.append([i1, i2])
        if split == "training":
            self.flow_list = sorted(glob(osp.join(root, "flow_occ/*_10.png")))


class KITTI12(FlowDataset):
    def __init__(self, aug_params=None, split="training", root="datasets/KITTI12"):
        super().__init__(aug_params, sparse=True)
        if split == "testing":
            self.is_test = True
        root = osp.join(root, split)
        images1 = sorted(glob(osp.join(root, "colored_0/*_10.png")))
        images2 = sorted(glob(osp.join(root, "colored_0/*_11.png")))
        for i1, i2 in zip(images1, images2):
            self.extra_info.append([osp.basename(i1)])
            self.image_list.append([i1, i2])
        if split == "training":
            self.flow_list = sorted(glob(osp.join(root, "flow_occ/*_10.png")))


class HD1K(FlowDataset):
    def __init__(self, aug_params=None, root="datasets/HD1K"):
        super().__init__(aug_params, sparse=True)
        seq = 0
        while True:
            flows = sorted(glob(osp.join(root, "hd1k_flow_gt", "flow_occ/%06d_*.png" % seq)))
            images = sorted(glob(osp.join(root, "hd1k_input", "image_2/%06d_*.png" % seq)))
            if not flows:
                break
            for i in range(len(flows) - 1):
                self.flow_list.append(flows[i])
                self.image_list.append([images[i], images[i + 1]])
            seq += 1


def build_train_dataset(stage: str, image_size: Tuple[int, int], root_prefix: str = "datasets"):
    """Stage recipes with the reference's weighted mixes (datasets.py:339-406)."""

    def r(name):
        return osp.join(root_prefix, name)

    if stage == "chairs":
        aug = dict(crop_size=image_size, min_scale=-0.1, max_scale=1.0, do_flip=True)
        return FlyingChairs(aug, split="training", root=r("FlyingChairs_release/data"))
    if stage == "things":
        aug = dict(crop_size=image_size, min_scale=-0.4, max_scale=0.8, do_flip=True)
        return FlyingThings3D(aug, root=r("FlyingThings3D"), dstype="frames_cleanpass") + \
            FlyingThings3D(aug, root=r("FlyingThings3D"), dstype="frames_finalpass")
    if stage == "vkitti2":
        aug = dict(crop_size=image_size, min_scale=-0.3, max_scale=0.5, do_flip=True)
        return VKITTI2(aug, root=r("VKITTI2"))
    if stage == "sintel":
        aug = dict(crop_size=image_size, min_scale=-0.2, max_scale=0.6, do_flip=True)
        things = FlyingThings3D(aug, root=r("FlyingThings3D"), dstype="frames_cleanpass")
        sintel_clean = MpiSintel(aug, split="training", dstype="clean", root=r("Sintel"))
        sintel_final = MpiSintel(aug, split="training", dstype="final", root=r("Sintel"))
        aug_k = dict(crop_size=image_size, min_scale=-0.3, max_scale=0.5, do_flip=True)
        kitti = KITTI(aug_k, root=r("KITTI"))
        aug_h = dict(crop_size=image_size, min_scale=-0.5, max_scale=0.2, do_flip=True)
        hd1k = HD1K(aug_h, root=r("HD1K"))
        return 100 * sintel_clean + 100 * sintel_final + 200 * kitti + 5 * hd1k + things
    if stage == "sintel_ft":
        aug = dict(crop_size=image_size, min_scale=-0.2, max_scale=0.6, do_flip=True)
        sintel_clean = MpiSintel(aug, split="training", dstype="clean", root=r("Sintel"))
        sintel_final = MpiSintel(aug, split="training", dstype="final", root=r("Sintel"))
        return sintel_clean + 2 * sintel_final
    if stage == "kitti":
        aug = dict(crop_size=image_size, min_scale=-0.2, max_scale=0.4, do_flip=False)
        return KITTI(aug, split="training", root=r("KITTI"))
    if stage == "kitti_mix":
        aug = dict(crop_size=image_size, min_scale=-0.2, max_scale=0.4, do_flip=False)
        kitti15 = KITTI(aug, split="training", root=r("KITTI"))
        kitti12 = KITTI12(aug, split="training", root=r("KITTI12"))
        return 2 * kitti15 + kitti12
    raise ValueError(f"unknown stage: {stage}")
