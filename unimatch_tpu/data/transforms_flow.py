"""Training-time augmentation for optical flow (CPU, numpy/cv2).

Capability parity with reference dataloader/flow/transforms.py:
  FlowAugmentor        :7-149  dense flow: color jitter (asymmetric 20% of
                               the time), optional eraser, random scale +
                               stretch (2^U), h/v flip, fixed-size crop
  SparseFlowAugmentor  :152-284 sparse (KITTI) flow: same photometric/crop,
                               but resize scatters valid flow points instead
                               of interpolating

Fixed crop sizes keep downstream device shapes static (one compiled program
per training stage).
"""

from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from unimatch_tpu.data.color_jitter import ColorJitter
from unimatch_tpu.data.rng import get_rng


class FlowAugmentor:
    def __init__(
        self,
        crop_size: Tuple[int, int],
        min_scale: float = -0.2,
        max_scale: float = 0.5,
        do_flip: bool = True,
        no_eraser_aug: bool = True,
    ):
        self.crop_size = crop_size
        self.min_scale = min_scale
        self.max_scale = max_scale
        self.spatial_aug_prob = 0.8
        self.stretch_prob = 0.8
        self.max_stretch = 0.2
        self.do_flip = do_flip
        self.h_flip_prob = 0.5
        self.v_flip_prob = 0.1
        self.photo_aug = ColorJitter(brightness=0.4, contrast=0.4, saturation=0.4, hue=0.5 / 3.14)
        self.asymmetric_color_aug_prob = 0.2
        self.eraser_aug_prob = -1 if no_eraser_aug else 0.5

    def color_transform(self, img1, img2):
        R = get_rng()
        if R.rand() < self.asymmetric_color_aug_prob:
            img1 = self.photo_aug(img1)
            img2 = self.photo_aug(img2)
        else:
            stack = np.concatenate([img1, img2], axis=0)
            stack = self.photo_aug(stack)
            img1, img2 = np.split(stack, 2, axis=0)
        return img1, img2

    def eraser_transform(self, img1, img2, bounds=(50, 100)):
        R = get_rng()
        ht, wd = img1.shape[:2]
        if R.rand() < self.eraser_aug_prob:
            mean_color = np.mean(img2.reshape(-1, 3), axis=0)
            for _ in range(R.randint(1, 3)):
                x0 = R.randint(0, wd)
                y0 = R.randint(0, ht)
                dx = R.randint(bounds[0], bounds[1])
                dy = R.randint(bounds[0], bounds[1])
                img2[y0 : y0 + dy, x0 : x0 + dx, :] = mean_color
        return img1, img2

    def spatial_transform(self, img1, img2, flow, occlusion=None):
        R = get_rng()
        import cv2

        ht, wd = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 8) / float(ht), (self.crop_size[1] + 8) / float(wd))

        scale = 2 ** R.uniform(self.min_scale, self.max_scale)
        scale_x = scale_y = scale
        if R.rand() < self.stretch_prob:
            scale_x *= 2 ** R.uniform(-self.max_stretch, self.max_stretch)
            scale_y *= 2 ** R.uniform(-self.max_stretch, self.max_stretch)
        scale_x = max(scale_x, min_scale)
        scale_y = max(scale_y, min_scale)

        if R.rand() < self.spatial_aug_prob:
            img1 = cv2.resize(img1, None, fx=scale_x, fy=scale_y, interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=scale_x, fy=scale_y, interpolation=cv2.INTER_LINEAR)
            flow = cv2.resize(flow, None, fx=scale_x, fy=scale_y, interpolation=cv2.INTER_LINEAR)
            flow = flow * [scale_x, scale_y]
            if occlusion is not None:
                occlusion = cv2.resize(
                    occlusion, None, fx=scale_x, fy=scale_y, interpolation=cv2.INTER_LINEAR
                )

        if self.do_flip:
            if R.rand() < self.h_flip_prob:
                img1, img2 = img1[:, ::-1], img2[:, ::-1]
                flow = flow[:, ::-1] * [-1.0, 1.0]
                if occlusion is not None:
                    occlusion = occlusion[:, ::-1]
            if R.rand() < self.v_flip_prob:
                img1, img2 = img1[::-1, :], img2[::-1, :]
                flow = flow[::-1, :] * [1.0, -1.0]
                if occlusion is not None:
                    occlusion = occlusion[::-1, :]

        y0 = R.randint(0, img1.shape[0] - self.crop_size[0]) if img1.shape[0] > self.crop_size[0] else 0
        x0 = R.randint(0, img1.shape[1] - self.crop_size[1]) if img1.shape[1] > self.crop_size[1] else 0

        sl = np.s_[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        img1, img2, flow = img1[sl], img2[sl], flow[sl]
        if occlusion is not None:
            return img1, img2, flow, occlusion[sl]
        return img1, img2, flow

    def __call__(self, img1, img2, flow, occlusion=None):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        out = self.spatial_transform(img1, img2, flow, occlusion)
        return tuple(np.ascontiguousarray(x) for x in out)


class SparseFlowAugmentor(FlowAugmentor):
    """KITTI-style sparse flow: valid-point-scattering resize (reference :198-230)."""

    def __init__(self, crop_size, min_scale=-0.2, max_scale=0.5, do_flip=False, no_eraser_aug=True):
        super().__init__(crop_size, min_scale, max_scale, do_flip, no_eraser_aug)

    @staticmethod
    def resize_sparse_flow_map(flow, valid, fx=1.0, fy=1.0):
        ht, wd = flow.shape[:2]
        coords = np.stack(np.meshgrid(np.arange(wd), np.arange(ht)), axis=-1).astype(np.float32)
        coords = coords.reshape(-1, 2)
        flow_flat = flow.reshape(-1, 2)
        valid_flat = valid.reshape(-1).astype(bool)

        coords0 = coords[valid_flat]
        flow0 = flow_flat[valid_flat]

        ht1 = int(round(ht * fy))
        wd1 = int(round(wd * fx))
        coords1 = coords0 * [fx, fy]
        flow1 = flow0 * [fx, fy]

        xx = np.round(coords1[:, 0]).astype(np.int32)
        yy = np.round(coords1[:, 1]).astype(np.int32)
        keep = (xx >= 0) & (xx < wd1) & (yy >= 0) & (yy < ht1)
        xx, yy, flow1 = xx[keep], yy[keep], flow1[keep]

        flow_img = np.zeros([ht1, wd1, 2], np.float32)
        valid_img = np.zeros([ht1, wd1], np.int32)
        flow_img[yy, xx] = flow1
        valid_img[yy, xx] = 1
        return flow_img, valid_img

    def spatial_transform(self, img1, img2, flow, valid):
        R = get_rng()
        import cv2

        ht, wd = img1.shape[:2]
        min_scale = max((self.crop_size[0] + 1) / float(ht), (self.crop_size[1] + 1) / float(wd))

        scale = 2 ** R.uniform(self.min_scale, self.max_scale)
        scale_x = max(scale, min_scale)
        scale_y = max(scale, min_scale)

        if R.rand() < self.spatial_aug_prob:
            img1 = cv2.resize(img1, None, fx=scale_x, fy=scale_y, interpolation=cv2.INTER_LINEAR)
            img2 = cv2.resize(img2, None, fx=scale_x, fy=scale_y, interpolation=cv2.INTER_LINEAR)
            flow, valid = self.resize_sparse_flow_map(flow, valid, fx=scale_x, fy=scale_y)

        if self.do_flip and R.rand() < self.h_flip_prob:
            img1, img2 = img1[:, ::-1], img2[:, ::-1]
            flow = flow[:, ::-1] * [-1.0, 1.0]
            valid = valid[:, ::-1]

        margin_y, margin_x = 20, 50
        y0 = R.randint(0, max(img1.shape[0] - self.crop_size[0] + margin_y, 1))
        x0 = R.randint(-margin_x, max(img1.shape[1] - self.crop_size[1] + margin_x, -margin_x + 1))
        y0 = int(np.clip(y0, 0, max(img1.shape[0] - self.crop_size[0], 0)))
        x0 = int(np.clip(x0, 0, max(img1.shape[1] - self.crop_size[1], 0)))

        sl = np.s_[y0 : y0 + self.crop_size[0], x0 : x0 + self.crop_size[1]]
        return img1[sl], img2[sl], flow[sl], valid[sl]

    def __call__(self, img1, img2, flow, valid):
        img1, img2 = self.color_transform(img1, img2)
        img1, img2 = self.eraser_transform(img1, img2)
        img1, img2, flow, valid = self.spatial_transform(img1, img2, flow, valid)
        return tuple(np.ascontiguousarray(x) for x in (img1, img2, flow, valid))
