"""Optical-flow visualization (Middlebury color wheel), vectorized numpy.

Capability parity with reference utils/flow_viz.py (flow_to_image :240,
save_vis_flow_tofile :278). The color wheel is the standard Middlebury
encoding (55 hues over RY/YG/GC/CB/BM/MR segments); implementation here is
fully vectorized rather than per-channel loops.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


def make_color_wheel() -> np.ndarray:
    """[55, 3] uint8-range float color wheel."""
    RY, YG, GC, CB, BM, MR = 15, 6, 4, 11, 13, 6
    ncols = RY + YG + GC + CB + BM + MR
    wheel = np.zeros((ncols, 3), np.float32)
    col = 0

    def ramp(n, up):
        r = np.floor(255 * np.arange(n) / n)
        return r if up else 255 - r

    wheel[col : col + RY, 0] = 255
    wheel[col : col + RY, 1] = ramp(RY, True)
    col += RY
    wheel[col : col + YG, 0] = ramp(YG, False)
    wheel[col : col + YG, 1] = 255
    col += YG
    wheel[col : col + GC, 1] = 255
    wheel[col : col + GC, 2] = ramp(GC, True)
    col += GC
    wheel[col : col + CB, 1] = ramp(CB, False)
    wheel[col : col + CB, 2] = 255
    col += CB
    wheel[col : col + BM, 2] = 255
    wheel[col : col + BM, 0] = ramp(BM, True)
    col += BM
    wheel[col : col + MR, 2] = ramp(MR, False)
    wheel[col : col + MR, 0] = 255
    return wheel


_WHEEL = make_color_wheel()


def flow_to_image(flow: np.ndarray, max_flow: Optional[float] = None) -> np.ndarray:
    """[H, W, 2] flow -> [H, W, 3] uint8 visualization."""
    u = np.asarray(flow[..., 0], np.float32).copy()
    v = np.asarray(flow[..., 1], np.float32).copy()

    bad = ~(np.isfinite(u) & np.isfinite(v)) | (np.abs(u) > 1e7) | (np.abs(v) > 1e7)
    u[bad] = 0
    v[bad] = 0

    rad = np.sqrt(u**2 + v**2)
    maxrad = max_flow if max_flow is not None else max(rad.max(), 1e-5)
    u = u / (maxrad + 1e-5)
    v = v / (maxrad + 1e-5)

    rad = np.sqrt(u**2 + v**2)
    ncols = _WHEEL.shape[0]
    a = np.arctan2(-v, -u) / np.pi  # [-1, 1]
    fk = (a + 1) / 2 * (ncols - 1)
    k0 = np.floor(fk).astype(np.int32)
    k1 = (k0 + 1) % ncols
    f = (fk - k0)[..., None]

    col0 = _WHEEL[k0] / 255.0
    col1 = _WHEEL[k1] / 255.0
    col = (1 - f) * col0 + f * col1

    small = rad <= 1
    col = np.where(
        small[..., None], 1 - rad[..., None] * (1 - col), col * 0.75
    )
    col[bad] = 0
    return np.floor(255 * col).astype(np.uint8)


def save_vis_flow_tofile(flow: np.ndarray, path: str) -> None:
    from PIL import Image

    Image.fromarray(flow_to_image(flow)).save(path)
