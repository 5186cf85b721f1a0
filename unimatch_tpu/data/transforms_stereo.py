"""Stereo training/eval transforms on dict samples (CPU, numpy/cv2, torch-free).

Capability parity with reference dataloader/stereo/transforms.py:
Compose/ToTensor/Normalize (:10-64 — here ToArray: HWC float in [0,1] then
ImageNet normalize), RandomCrop with edge padding (:66-118),
RandomVerticalFlip (:120), the photometric set (Contrast/Gamma/Brightness/
Hue/Saturation chained in random order or single, :152-295), disp-aware
RandomScale (:296-331), Resize (:332), RandomGrayscale (:360),
RandomRotateShiftRight (Middlebury right-view perturbation, :378-408), and
RandomOcclusion (:409).

Samples are dicts: left/right [H, W, 3] float, disp [H, W] float.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from unimatch_tpu.data.rng import get_rng

from unimatch_tpu.data import color_jitter as CJ

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


class Compose:
    def __init__(self, transforms: Sequence):
        self.transforms = list(transforms)

    def __call__(self, sample):
        for t in self.transforms:
            sample = t(sample)
        return sample


class ToFloatAndNormalize:
    """uint8-range [0,255] -> ImageNet-normalized float32 (ToTensor+Normalize)."""

    def __call__(self, sample):
        for k in ("left", "right"):
            sample[k] = (sample[k].astype(np.float32) / 255.0 - IMAGENET_MEAN) / IMAGENET_STD
        if "disp" in sample:
            sample["disp"] = sample["disp"].astype(np.float32)
        return sample


class RandomCrop:
    def __init__(self, img_height: int, img_width: int):
        self.h = img_height
        self.w = img_width

    def __call__(self, sample):
        oh, ow = sample["left"].shape[:2]
        if self.h > oh or self.w > ow:
            top = max(self.h - oh, 0)
            right = max(self.w - ow, 0)
            for k in ("left", "right"):
                sample[k] = np.pad(sample[k], ((top, 0), (0, right), (0, 0)), mode="edge")
            if "disp" in sample:
                sample["disp"] = np.pad(sample["disp"], ((top, 0), (0, right)), mode="constant")
            oh, ow = sample["left"].shape[:2]

        x0 = get_rng().randint(ow - self.w + 1)
        y0 = get_rng().randint(oh - self.h + 1)
        for k in ("left", "right"):
            sample[k] = sample[k][y0 : y0 + self.h, x0 : x0 + self.w]
        if "disp" in sample:
            sample["disp"] = sample["disp"][y0 : y0 + self.h, x0 : x0 + self.w]
        return sample


class RandomVerticalFlip:
    def __call__(self, sample):
        if get_rng().random() < 0.5:
            for k in ("left", "right"):
                sample[k] = np.flipud(sample[k]).copy()
            sample["disp"] = np.flipud(sample["disp"]).copy()
        return sample


def _adjust_gamma(img: np.ndarray, gamma: float) -> np.ndarray:
    return np.clip(255.0 * (img.astype(np.float32) / 255.0) ** gamma, 0, 255).astype(np.uint8)


class _PairPhotometric:
    """Apply one photometric op to left/right, re-sampling the parameter for
    the right view half the time (asymmetric augmentation)."""

    prob = 0.5

    def __init__(self, asymmetric_color_aug: bool = True):
        self.asymmetric = asymmetric_color_aug

    def _sample_param(self):
        raise NotImplementedError

    def _apply(self, img, param):
        raise NotImplementedError

    def __call__(self, sample):
        if get_rng().random() < self.prob:
            p = self._sample_param()
            sample["left"] = self._apply(sample["left"], p)
            if self.asymmetric and get_rng().random() < 0.5:
                p = self._sample_param()
            sample["right"] = self._apply(sample["right"], p)
        return sample


class RandomContrast(_PairPhotometric):
    def _sample_param(self):
        return get_rng().uniform(0.8, 1.2)

    def _apply(self, img, p):
        return CJ.adjust_contrast(img, p)


class RandomGamma(_PairPhotometric):
    def _sample_param(self):
        return get_rng().uniform(0.7, 1.5)

    def _apply(self, img, p):
        return _adjust_gamma(img, p)


class RandomBrightness(_PairPhotometric):
    def _sample_param(self):
        return get_rng().uniform(0.5, 2.0)

    def _apply(self, img, p):
        return CJ.adjust_brightness(img, p)


class RandomHue(_PairPhotometric):
    def _sample_param(self):
        return get_rng().uniform(-0.1, 0.1)

    def _apply(self, img, p):
        return CJ.adjust_hue(img, p)


class RandomSaturation(_PairPhotometric):
    def _sample_param(self):
        return get_rng().uniform(0.8, 1.2)

    def _apply(self, img, p):
        return CJ.adjust_saturation(img, p)


class RandomColor:
    def __init__(self, asymmetric_color_aug: bool = True):
        self.asymmetric = asymmetric_color_aug

    def __call__(self, sample):
        for k in ("left", "right"):
            sample[k] = sample[k].astype(np.uint8)
        transforms = [
            RandomContrast(self.asymmetric),
            RandomGamma(self.asymmetric),
            RandomBrightness(self.asymmetric),
            RandomHue(self.asymmetric),
            RandomSaturation(self.asymmetric),
        ]
        R = get_rng()
        if R.random() < 0.5:
            sample = transforms[R.randint(len(transforms))](sample)
        else:
            for i in R.permutation(len(transforms)):
                sample = transforms[i](sample)
        for k in ("left", "right"):
            sample[k] = sample[k].astype(np.float32)
        return sample


class RandomScale:
    def __init__(self, min_scale=-0.4, max_scale=0.4, crop_width=512, nearest_interp=False):
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.crop_width = crop_width
        self.nearest_interp = nearest_interp

    def __call__(self, sample):
        import cv2

        if get_rng().rand() < 0.5:
            h, w = sample["disp"].shape
            scale_x = 2 ** get_rng().uniform(self.min_scale, self.max_scale)
            scale_x = max(scale_x, self.crop_width / float(w))
            interp = cv2.INTER_NEAREST if self.nearest_interp else cv2.INTER_LINEAR
            for k in ("left", "right"):
                sample[k] = cv2.resize(sample[k], None, fx=scale_x, fy=1.0, interpolation=cv2.INTER_LINEAR)
            sample["disp"] = cv2.resize(sample["disp"], None, fx=scale_x, fy=1.0, interpolation=interp) * scale_x
        return sample


class Resize:
    def __init__(self, scale_x=1.0, scale_y=1.0, nearest_interp=True):
        self.scale_x = scale_x
        self.scale_y = scale_y
        self.nearest_interp = nearest_interp

    def __call__(self, sample):
        import cv2

        interp = cv2.INTER_NEAREST if self.nearest_interp else cv2.INTER_LINEAR
        for k in ("left", "right"):
            sample[k] = cv2.resize(sample[k], None, fx=self.scale_x, fy=self.scale_y,
                                   interpolation=cv2.INTER_LINEAR)
        sample["disp"] = cv2.resize(sample["disp"], None, fx=self.scale_x, fy=self.scale_y,
                                    interpolation=interp) * self.scale_x
        return sample


class RandomGrayscale:
    def __init__(self, p=0.2):
        self.p = p

    def __call__(self, sample):
        if get_rng().random() < self.p:
            for k in ("left", "right"):
                img = sample[k].astype(np.float32)
                gray = img @ np.array([0.2989, 0.587, 0.114], np.float32)
                sample[k] = np.repeat(gray[..., None], 3, axis=-1)
        return sample


class RandomRotateShiftRight:
    """Perturb the right image (rotation + vertical shift) — Middlebury trick."""

    def __init__(self, p=0.5):
        self.p = p

    def __call__(self, sample):
        import cv2

        if get_rng().random() < self.p:
            angle, pixel = 0.1, 2
            px = get_rng().uniform(-pixel, pixel)
            ag = get_rng().uniform(-angle, angle)
            right = sample["right"]
            center = (get_rng().uniform(0, right.shape[0]), get_rng().uniform(0, right.shape[1]))
            rot = cv2.getRotationMatrix2D(center, ag, 1.0)
            right = cv2.warpAffine(right, rot, right.shape[1::-1], flags=cv2.INTER_LINEAR)
            trans = np.float32([[1, 0, 0], [0, 1, px]])
            right = cv2.warpAffine(right, trans, right.shape[1::-1], flags=cv2.INTER_LINEAR)
            sample["right"] = right
        return sample


class RandomOcclusion:
    def __init__(self, p=0.5, occlusion_mask_zero=False):
        self.p = p
        self.zero = occlusion_mask_zero

    def __call__(self, sample):
        if get_rng().random() < self.p:
            img = sample["right"]
            ht, wd = img.shape[:2]
            mean_color = 0 if self.zero else np.mean(img.reshape(-1, 3), axis=0)
            x0 = get_rng().randint(0, wd)
            y0 = get_rng().randint(0, ht)
            dx = get_rng().randint(50, 100)
            dy = get_rng().randint(50, 100)
            img[y0 : y0 + dy, x0 : x0 + dx, :] = mean_color
            sample["right"] = img
        return sample
