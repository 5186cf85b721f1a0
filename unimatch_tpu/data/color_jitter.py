"""Numpy/cv2 color jitter with torchvision-equivalent semantics.

The reference augmentors use torchvision.transforms.ColorJitter
(dataloader/flow/transforms.py:4,27). torchvision is not a dependency here;
this reimplements the documented sampling semantics: multiplicative factors
uniform in [max(0, 1-x), 1+x] for brightness/contrast/saturation, additive
hue shift uniform in [-h, h] (fractions of the hue circle), applied in a
random order per call.
"""

from __future__ import annotations

import numpy as np


def _blend(a: np.ndarray, b: np.ndarray, factor: float) -> np.ndarray:
    return np.clip(factor * a + (1.0 - factor) * b, 0, 255).astype(np.uint8)


def adjust_brightness(img: np.ndarray, factor: float) -> np.ndarray:
    return _blend(img.astype(np.float32), np.zeros_like(img, np.float32), factor)


def adjust_contrast(img: np.ndarray, factor: float) -> np.ndarray:
    gray = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    mean = gray.mean()
    return _blend(img.astype(np.float32), np.full_like(img, mean, dtype=np.float32), factor)


def adjust_saturation(img: np.ndarray, factor: float) -> np.ndarray:
    gray = img.astype(np.float32) @ np.array([0.299, 0.587, 0.114], np.float32)
    return _blend(img.astype(np.float32), gray[..., None], factor)


def adjust_hue(img: np.ndarray, shift: float) -> np.ndarray:
    """shift in [-0.5, 0.5] fractions of the hue circle."""
    import cv2

    hsv = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    h = hsv[..., 0].astype(np.int32)  # OpenCV uint8 hue is [0, 180)
    h = (h + int(round(shift * 180.0))) % 180
    hsv[..., 0] = h.astype(np.uint8)
    return cv2.cvtColor(hsv, cv2.COLOR_HSV2RGB)


class ColorJitter:
    """Callable uint8 RGB -> uint8 RGB, torchvision-style parameter sampling."""

    def __init__(self, brightness=0.0, contrast=0.0, saturation=0.0, hue=0.0, rng=None):
        self.brightness = brightness
        self.contrast = contrast
        self.saturation = saturation
        self.hue = hue
        self.rng = rng

    def __call__(self, img: np.ndarray) -> np.ndarray:
        if self.rng is None:
            from unimatch_tpu.data.rng import get_rng

            rng = get_rng()
        else:
            rng = self.rng
        ops = []
        if self.brightness > 0:
            f = rng.uniform(max(0.0, 1 - self.brightness), 1 + self.brightness)
            ops.append(lambda im: adjust_brightness(im, f))
        if self.contrast > 0:
            f = rng.uniform(max(0.0, 1 - self.contrast), 1 + self.contrast)
            ops.append(lambda im: adjust_contrast(im, f))
        if self.saturation > 0:
            f = rng.uniform(max(0.0, 1 - self.saturation), 1 + self.saturation)
            ops.append(lambda im: adjust_saturation(im, f))
        if self.hue > 0:
            s = rng.uniform(-self.hue, self.hue)
            ops.append(lambda im: adjust_hue(im, s))
        for i in rng.permutation(len(ops)):
            img = ops[i](img)
        return img
