"""Stereo datasets, per-format disparity decoders, and stage recipes.

Capability parity with reference dataloader/stereo/datasets.py (17 dataset
classes + `build_dataset` recipes :636-936) and utils/file_io.py's 10
disparity decoders (:20-201). Samples are numpy dicts
{"left", "right", "disp"(optional), "left_name"(optional)}.
"""

from __future__ import annotations

import json
import os
import os.path as osp
from glob import glob
from typing import Dict, List, Optional

import numpy as np

from unimatch_tpu.data import transforms_stereo as T
from unimatch_tpu.utils import frame_utils


# ---------------- disparity decoders (reference utils/file_io.py:20-201) ---


def read_disp(path: str, *, subset=False, vkitti2=False, sintel=False, tartanair=False,
              instereo2k=False, crestereo=False, fallingthings=False, argoverse=False,
              raw_disp_png=False) -> np.ndarray:
    from PIL import Image

    if path.endswith("pfm"):
        disp, _ = frame_utils.read_pfm(path)
        return -disp if subset else disp
    if vkitti2:
        return _read_vkitti2_disp(path)
    if sintel:
        return _read_sintel_disp(path)
    if tartanair:
        return 80.0 / np.load(path)
    if instereo2k:
        return np.asarray(Image.open(path), np.float32) / 100.0
    if crestereo:
        return np.asarray(Image.open(path), np.float32) / 32.0
    if fallingthings:
        return _read_fallingthings_disp(path)
    if argoverse:
        import cv2

        return cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH).astype(np.float32) / 256.0
    if raw_disp_png:
        return np.asarray(Image.open(path), np.float32)
    if path.endswith("png"):  # KITTI
        return np.asarray(Image.open(path), np.float32) / 256.0
    if path.endswith("npy"):
        return np.load(path)
    raise ValueError(f"unknown disparity format: {path}")


def _read_vkitti2_disp(path: str) -> np.ndarray:
    import cv2

    depth = cv2.imread(path, cv2.IMREAD_ANYCOLOR | cv2.IMREAD_ANYDEPTH)
    depth = (depth / 100).astype(np.float32)  # cm -> m, sky clipped at 655.35
    valid = (depth > 0) & (depth < 655)
    disp = 0.532725 * 725.0087 / np.maximum(depth, 1e-6)  # baseline * focal / depth
    disp[~valid] = 1e-6
    return disp


def _read_sintel_disp(path: str) -> np.ndarray:
    from PIL import Image

    rgb = np.asarray(Image.open(path), np.float32)
    return rgb[..., 0] * 4 + rgb[..., 1] / 2**6 + rgb[..., 2] / 2**14


def _read_fallingthings_disp(path: str) -> np.ndarray:
    from PIL import Image

    depth = np.asarray(Image.open(path), np.float32)
    with open(osp.join(osp.dirname(path), "_camera_settings.json")) as f:
        intr = json.load(f)
    fx = intr["camera_settings"][0]["intrinsic_settings"]["fx"]
    return (fx * 6.0 * 100) / np.maximum(depth, 1e-6)


# ---------------- base ----------------


class StereoDataset:
    def __init__(self, transform=None, disp_reader_kwargs: Optional[dict] = None,
                 inf_invalid=False, half_resolution=False, save_filename=False):
        self.transform = transform
        self.disp_reader_kwargs = disp_reader_kwargs or {}
        self.inf_invalid = inf_invalid
        self.half_resolution = half_resolution
        self.save_filename = save_filename
        self.samples: List[Dict[str, str]] = []

    def __len__(self):
        return len(self.samples)

    def __rmul__(self, v: int):
        self.samples = v * self.samples
        return self

    def __add__(self, other):
        return ConcatStereoDataset([self, other])

    def __getitem__(self, index):
        import cv2

        path = self.samples[index]
        sample = {
            "left": frame_utils.read_image(path["left"]),
            "right": frame_utils.read_image(path["right"]),
        }
        if self.save_filename or "left_name" in path:
            sample["left_name"] = path.get("left_name", osp.basename(path["left"]))
        if path.get("disp") is not None:
            disp = read_disp(path["disp"], **self.disp_reader_kwargs)
            if self.inf_invalid:
                disp = np.where(np.isinf(disp), 0.0, disp)
            sample["disp"] = disp.astype(np.float32)

        if self.half_resolution:
            sample["left"] = cv2.resize(sample["left"], None, fx=0.5, fy=0.5,
                                        interpolation=cv2.INTER_LINEAR)
            sample["right"] = cv2.resize(sample["right"], None, fx=0.5, fy=0.5,
                                         interpolation=cv2.INTER_LINEAR)
            sample["disp"] = cv2.resize(sample["disp"], None, fx=0.5, fy=0.5,
                                        interpolation=cv2.INTER_LINEAR) * 0.5

        if self.transform is not None:
            sample = self.transform(sample)

        # normalize output keys for the generic train loop
        if "disp" in sample:
            out = {
                "img0": sample["left"].astype(np.float32),
                "img1": sample["right"].astype(np.float32),
                "disp_gt": sample["disp"],
                "valid": (sample["disp"] > 0).astype(np.float32),
            }
            if "left_name" in sample:
                out["left_name"] = sample["left_name"]
            return out
        return sample


class ConcatStereoDataset:
    def __init__(self, datasets):
        self.datasets = []
        for d in datasets:
            if isinstance(d, ConcatStereoDataset):
                self.datasets.extend(d.datasets)
            else:
                self.datasets.append(d)
        self._cum = np.cumsum([len(d) for d in self.datasets])

    def __len__(self):
        return int(self._cum[-1])

    def __add__(self, other):
        return ConcatStereoDataset([self, other])

    def __getitem__(self, index):
        i = int(np.searchsorted(self._cum, index, side="right"))
        prev = 0 if i == 0 else int(self._cum[i - 1])
        return self.datasets[i][index - prev]


# ---------------- datasets ----------------


class FlyingThings3D(StereoDataset):
    def __init__(self, data_dir="datasets/FlyingThings3D", mode="TRAIN",
                 split="frames_finalpass", transform=None):
        super().__init__(transform=transform)
        for left in sorted(glob(f"{data_dir}/{split}/{mode}/*/*/left/*.png")):
            self.samples.append({
                "left": left,
                "right": left.replace("/left/", "/right/"),
                "disp": left.replace(split, "disparity")[:-4] + ".pfm",
            })


class Monkaa(StereoDataset):
    def __init__(self, data_dir="datasets/Monkaa", split="frames_finalpass", transform=None):
        super().__init__(transform=transform)
        for left in sorted(glob(f"{data_dir}/{split}/*/left/*.png")):
            self.samples.append({
                "left": left,
                "right": left.replace("/left/", "/right/"),
                "disp": left.replace(split, "disparity")[:-4] + ".pfm",
            })


class Driving(StereoDataset):
    def __init__(self, data_dir="datasets/Driving", split="frames_finalpass", transform=None):
        super().__init__(transform=transform)
        for left in sorted(glob(f"{data_dir}/{split}/*/*/*/left/*.png")):
            self.samples.append({
                "left": left,
                "right": left.replace("/left/", "/right/"),
                "disp": left.replace(split, "disparity")[:-4] + ".pfm",
            })


class KITTI15(StereoDataset):
    def __init__(self, data_dir="datasets/KITTI/stereo/kitti_2015", mode="training",
                 transform=None, save_filename=False):
        super().__init__(transform=transform, save_filename=save_filename or mode == "testing")
        for left in sorted(glob(f"{data_dir}/{mode}/image_2/*_10.png")):
            s = {"left": left, "right": left.replace("image_2", "image_3")}
            if mode != "testing":
                s["disp"] = left.replace("image_2", "disp_occ_0")
            if self.save_filename:
                s["left_name"] = osp.basename(left)
            self.samples.append(s)


class KITTI12(StereoDataset):
    def __init__(self, data_dir="datasets/KITTI/stereo/kitti_2012", mode="training",
                 transform=None):
        super().__init__(transform=transform, save_filename=mode == "testing")
        for left in sorted(glob(f"{data_dir}/{mode}/colored_0/*_10.png")):
            s = {"left": left, "right": left.replace("/colored_0/", "/colored_1/")}
            if mode != "testing":
                s["disp"] = left.replace("/colored_0/", "/disp_occ/")
            if self.save_filename:
                s["left_name"] = osp.basename(left)
            self.samples.append(s)


class VKITTI2(StereoDataset):
    def __init__(self, data_dir="datasets/VKITTI2", transform=None):
        super().__init__(transform=transform, disp_reader_kwargs={"vkitti2": True})
        for left in sorted(glob(f"{data_dir}/Scene*/*/frames/rgb/Camera_0/rgb*.jpg")):
            self.samples.append({
                "left": left,
                "right": left.replace("/Camera_0/", "/Camera_1/"),
                "disp": left.replace("/rgb/", "/depth/").replace("rgb_", "depth_")[:-3] + "png",
            })


class DrivingStereo(StereoDataset):
    def __init__(self, data_dir="datasets/DrivingStereo", transform=None):
        super().__init__(transform=transform)
        lefts = sorted(glob(f"{data_dir}/train-left-image/*/*.jpg"))
        rights = sorted(glob(f"{data_dir}/train-right-image/*/*.jpg"))
        disps = sorted(glob(f"{data_dir}/train-disparity-map/*/*.png"))
        for l, r, d in zip(lefts, rights, disps):
            self.samples.append({"left": l, "right": r, "disp": d})


class SintelStereo(StereoDataset):
    def __init__(self, data_dir="datasets/SintelStereo", split="clean", transform=None,
                 save_filename=False):
        super().__init__(transform=transform, disp_reader_kwargs={"sintel": True},
                         save_filename=save_filename)
        lefts = sorted(glob(f"{data_dir}/training/{split}_left/*/*.png"))
        rights = sorted(glob(f"{data_dir}/training/{split}_right/*/*.png"))
        disps = sorted(glob(f"{data_dir}/training/disparities/*/*.png"))
        for l, r, d in zip(lefts, rights, disps):
            self.samples.append({"left": l, "right": r, "disp": d, "left_name": l})


class ETH3DStereo(StereoDataset):
    def __init__(self, data_dir="datasets/ETH3D", mode="train", transform=None,
                 save_filename=False):
        super().__init__(transform=transform, inf_invalid=True, save_filename=save_filename)
        sub = "two_view_training" if mode == "train" else "two_view_test"
        lefts = sorted(glob(f"{data_dir}/{sub}/*/im0.png"))
        rights = sorted(glob(f"{data_dir}/{sub}/*/im1.png"))
        disps = sorted(glob(f"{data_dir}/two_view_training_gt/*/disp0GT.pfm")) if mode == "train" else [None] * len(lefts)
        for l, r, d in zip(lefts, rights, disps):
            s = {"left": l, "right": r, "disp": d}
            if save_filename:
                s["left_name"] = l
            self.samples.append(s)


class MiddleburyEval3(StereoDataset):
    def __init__(self, data_dir="datasets/Middlebury/MiddEval3", mode="training",
                 resolution="H", transform=None, save_filename=False):
        super().__init__(transform=transform, inf_invalid=True, save_filename=save_filename)
        lefts = sorted(glob(f"{data_dir}/{mode}{resolution}/*/im0.png"))
        rights = sorted(glob(f"{data_dir}/{mode}{resolution}/*/im1.png"))
        disps = (
            sorted(glob(f"{data_dir}/{mode}{resolution}/*/disp0GT.pfm"))
            if mode == "training"
            else [None] * len(lefts)
        )
        for l, r, d in zip(lefts, rights, disps):
            s = {"left": l, "right": r, "disp": d}
            if save_filename:
                s["left_name"] = l
            self.samples.append(s)


class Middlebury20052006(StereoDataset):
    def __init__(self, data_dir="datasets/Middlebury/2005", transform=None, save_filename=False):
        super().__init__(transform=transform, disp_reader_kwargs={"raw_disp_png": True},
                         save_filename=save_filename)
        for d in sorted(os.listdir(data_dir)):
            if d.endswith(".zip"):
                continue
            gt = osp.join(data_dir, d, "disp1.png")
            self.samples.append({"left": osp.join(data_dir, d, "view1.png"),
                                 "right": osp.join(data_dir, d, "view5.png"), "disp": gt})
            for illum in ("Illum1", "Illum2", "Illum3"):
                for exp in ("Exp0", "Exp1", "Exp2"):
                    self.samples.append({
                        "left": osp.join(data_dir, d, illum, exp, "view1.png"),
                        "right": osp.join(data_dir, d, illum, exp, "view5.png"),
                        "disp": gt,
                    })


class Middlebury2014(StereoDataset):
    def __init__(self, data_dir="datasets/Middlebury/2014", transform=None,
                 save_filename=False, half_resolution=True):
        super().__init__(transform=transform, inf_invalid=True, half_resolution=half_resolution,
                         save_filename=save_filename)
        for d in sorted(os.listdir(data_dir)):
            if d.endswith(".zip"):
                continue
            for variant in ("", "E", "L"):
                self.samples.append({
                    "left": osp.join(data_dir, d, "im0.png"),
                    "right": osp.join(data_dir, d, f"im1{variant}.png"),
                    "disp": osp.join(data_dir, d, "disp0.pfm"),
                })


class Middlebury2021(StereoDataset):
    def __init__(self, data_dir="datasets/Middlebury/2021/data", transform=None,
                 save_filename=False):
        super().__init__(transform=transform, inf_invalid=True, save_filename=save_filename)
        for d in sorted(os.listdir(data_dir)):
            if d.endswith(".zip"):
                continue
            gt = osp.join(data_dir, d, "disp0.pfm")
            self.samples.append({"left": osp.join(data_dir, d, "im0.png"),
                                 "right": osp.join(data_dir, d, "im1.png"), "disp": gt})
            for img0 in sorted(glob(osp.join(data_dir, d, "ambient", "L0", "im0e*.png"))):
                self.samples.append({"left": img0, "right": img0.replace("/im0", "/im1"),
                                     "disp": gt})


class CREStereoDataset(StereoDataset):
    def __init__(self, data_dir="datasets/CREStereo/stereo_trainset/crestereo", transform=None):
        super().__init__(transform=transform, disp_reader_kwargs={"crestereo": True},
                         inf_invalid=True)
        lefts = sorted(glob(f"{data_dir}/*/*_left.jpg"))
        rights = sorted(glob(f"{data_dir}/*/*_right.jpg"))
        disps = sorted(glob(f"{data_dir}/*/*_left.disp.png"))
        for l, r, d in zip(lefts, rights, disps):
            self.samples.append({"left": l, "right": r, "disp": d})


class TartanAir(StereoDataset):
    def __init__(self, data_dir="datasets/Tartanair", transform=None):
        super().__init__(transform=transform, disp_reader_kwargs={"tartanair": True})
        lefts = sorted(glob(f"{data_dir}/*/*/*/*/image_left/*.png"))
        rights = sorted(glob(f"{data_dir}/*/*/*/*/image_right/*.png"))
        disps = sorted(glob(f"{data_dir}/*/*/*/*/depth_left/*.npy"))
        for l, r, d in zip(lefts, rights, disps):
            self.samples.append({"left": l, "right": r, "disp": d})


class CARLA(StereoDataset):
    def __init__(self, data_dir="datasets/HR-VS-Stereo/carla-highres/trainingF", transform=None):
        super().__init__(transform=transform, inf_invalid=True, half_resolution=True)
        lefts = sorted(glob(f"{data_dir}/*/im0.png"))
        rights = sorted(glob(f"{data_dir}/*/im1.png"))
        disps = sorted(glob(f"{data_dir}/*/disp0GT.pfm"))
        for l, r, d in zip(lefts, rights, disps):
            self.samples.append({"left": l, "right": r, "disp": d})


class InStereo2K(StereoDataset):
    def __init__(self, data_dir="datasets/InStereo2K", transform=None):
        super().__init__(transform=transform, disp_reader_kwargs={"instereo2k": True})
        lefts = sorted(glob(f"{data_dir}/train/*/*/left.png") + glob(f"{data_dir}/test/*/left.png"))
        rights = sorted(glob(f"{data_dir}/train/*/*/right.png") + glob(f"{data_dir}/test/*/right.png"))
        disps = sorted(glob(f"{data_dir}/train/*/*/left_disp.png") + glob(f"{data_dir}/test/*/left_disp.png"))
        for l, r, d in zip(lefts, rights, disps):
            self.samples.append({"left": l, "right": r, "disp": d})


class FallingThings(StereoDataset):
    def __init__(self, data_dir="datasets/FallingThings", transform=None):
        super().__init__(transform=transform, disp_reader_kwargs={"fallingthings": True})
        lefts = sorted(glob(f"{data_dir}/*/*/*left.jpg"))
        rights = sorted(glob(f"{data_dir}/*/*/*right.jpg"))
        disps = sorted(glob(f"{data_dir}/*/*/*left.depth.png"))
        for l, r, d in zip(lefts, rights, disps):
            self.samples.append({"left": l, "right": r, "disp": d})


# ---------------- stage recipes (reference :636-936) ----------------


def _base_transform(img_height, img_width, extra_front=(), rotate_shift_right=False):
    front = list(extra_front)
    mid = [T.RandomCrop(img_height, img_width)]
    if rotate_shift_right:
        mid.append(T.RandomRotateShiftRight())
    return T.Compose(
        front + mid + [T.RandomColor(), T.RandomVerticalFlip(), T.ToFloatAndNormalize()]
    )


def build_dataset(stage: str, img_height: int, img_width: int, root_prefix: str = "datasets"):
    def r(name):
        return osp.join(root_prefix, name)

    if stage == "sceneflow":
        tr = _base_transform(img_height, img_width, [T.RandomScale(crop_width=img_width)])
        return (
            FlyingThings3D(r("FlyingThings3D"), transform=tr)
            + Monkaa(r("Monkaa"), transform=tr)
            + Driving(r("Driving"), transform=tr)
        )
    if stage == "vkitti2":
        tr = _base_transform(img_height, img_width, [T.RandomScale(crop_width=img_width)])
        return VKITTI2(r("VKITTI2"), transform=tr)
    if stage == "kitti15mix":
        tr = _base_transform(img_height, img_width)
        kitti15 = KITTI15(r("KITTI/stereo/kitti_2015"), transform=tr)
        kitti12 = KITTI12(r("KITTI/stereo/kitti_2012"), transform=tr)
        return 200 * kitti15 + 100 * kitti12
    if stage in ("eth3d", "eth3d_ft"):
        dense_tr = _base_transform(
            img_height, img_width, [T.RandomScale(max_scale=0.4, crop_width=img_width)]
        )
        sparse_tr = _base_transform(img_height, img_width)
        eth3d = ETH3DStereo(r("ETH3D"), transform=sparse_tr)
        instereo2k = InStereo2K(r("InStereo2K"), transform=sparse_tr)
        crestereo = CREStereoDataset(r("CREStereo/stereo_trainset/crestereo"), transform=dense_tr)
        if stage == "eth3d_ft":
            return 1000 * eth3d + 10 * instereo2k + crestereo
        tartanair = TartanAir(r("Tartanair"), transform=dense_tr)
        things = FlyingThings3D(r("FlyingThings3D"), transform=dense_tr)
        monkaa = Monkaa(r("Monkaa"), transform=dense_tr)
        driving = Driving(r("Driving"), transform=dense_tr)
        sintel = SintelStereo(r("SintelStereo"), transform=dense_tr)
        return (
            tartanair + things + monkaa + driving + 50 * sintel + 1000 * eth3d
            + 100 * instereo2k + 2 * crestereo
        )
    if stage == "middlebury":
        lowres_tr = _base_transform(
            img_height, img_width,
            [T.RandomScale(min_scale=0, max_scale=1.0, crop_width=img_width)],
            rotate_shift_right=True,
        )
        highres_tr = _base_transform(
            img_height, img_width,
            [T.RandomScale(min_scale=-0.2, max_scale=0.4, crop_width=img_width, nearest_interp=True)],
            rotate_shift_right=True,
        )
        tartanair = TartanAir(r("Tartanair"), transform=lowres_tr)
        things = FlyingThings3D(r("FlyingThings3D"), transform=lowres_tr)
        monkaa = Monkaa(r("Monkaa"), transform=lowres_tr)
        driving = Driving(r("Driving"), transform=lowres_tr)
        fallingthings = FallingThings(r("FallingThings"), transform=lowres_tr)
        carla = CARLA(r("HR-VS-Stereo/carla-highres/trainingF"), transform=highres_tr)
        crestereo = CREStereoDataset(r("CREStereo/stereo_trainset/crestereo"), transform=highres_tr)
        instereo2k = InStereo2K(r("InStereo2K"), transform=highres_tr)
        mb2005 = Middlebury20052006(r("Middlebury/2005"), transform=highres_tr)
        mb2006 = Middlebury20052006(r("Middlebury/2006"), transform=highres_tr)
        mb2014 = Middlebury2014(r("Middlebury/2014"), transform=highres_tr, half_resolution=True)
        mb2021 = Middlebury2021(r("Middlebury/2021/data"), transform=highres_tr)
        mbeval3 = MiddleburyEval3(r("Middlebury/MiddEval3"), transform=highres_tr)
        return (
            tartanair + things + monkaa + driving + fallingthings + 50 * instereo2k
            + 50 * carla + crestereo + 200 * mb2005 + 200 * mb2006 + 200 * mb2014
            + 200 * mb2021 + 200 * mbeval3
        )
    if stage == "middlebury_ft":
        highres_tr = _base_transform(
            img_height, img_width,
            [T.RandomScale(min_scale=-0.6, max_scale=0.2, crop_width=img_width, nearest_interp=True)],
            rotate_shift_right=True,
        )
        resize_tr = T.Compose(
            [
                T.Resize(scale_x=1.2, scale_y=1.5, nearest_interp=False),
                T.RandomScale(crop_width=img_width, nearest_interp=True),
                T.RandomCrop(img_height, img_width),
                T.RandomRotateShiftRight(),
                T.RandomColor(),
                T.RandomVerticalFlip(),
                T.ToFloatAndNormalize(),
            ]
        )
        carla = CARLA(r("HR-VS-Stereo/carla-highres/trainingF"), transform=highres_tr)
        crestereo = CREStereoDataset(r("CREStereo/stereo_trainset/crestereo"), transform=highres_tr)
        instereo2k = InStereo2K(r("InStereo2K"), transform=highres_tr)
        mb2005 = Middlebury20052006(r("Middlebury/2005"), transform=highres_tr)
        mb2006 = Middlebury20052006(r("Middlebury/2006"), transform=highres_tr)
        mb2014 = Middlebury2014(r("Middlebury/2014"), transform=highres_tr, half_resolution=False)
        mb2014_half = Middlebury2014(r("Middlebury/2014"), transform=highres_tr, half_resolution=True)
        mb2021 = Middlebury2021(r("Middlebury/2021/data"), transform=highres_tr)
        mbeval3 = MiddleburyEval3(r("Middlebury/MiddEval3"), transform=highres_tr, resolution="F")
        mbeval3_half = MiddleburyEval3(r("Middlebury/MiddEval3"), transform=highres_tr, resolution="H")
        fallingthings = FallingThings(r("FallingThings"), transform=resize_tr)
        return (
            crestereo + 50 * instereo2k + 50 * carla + 200 * mb2005 + 200 * mb2006
            + 200 * mb2014 + 200 * mb2021 + 200 * mbeval3 + 200 * mb2014_half
            + 200 * mbeval3_half + 10 * fallingthings
        )
    raise ValueError(f"unknown stage: {stage}")
