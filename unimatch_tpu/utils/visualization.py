"""Disparity / depth colormaps and error maps.

Capability parity with reference utils/visualization.py: inferno disparity
(:11-16), KITTI disparity-error colormap (:19-59), plasma inverse-depth
(:92-107).
"""

from __future__ import annotations

import numpy as np


def _colormap(values01: np.ndarray, name: str) -> np.ndarray:
    import matplotlib

    mapper = matplotlib.colormaps[name]
    out = mapper(np.clip(values01, 0.0, 1.0))[..., :3]
    return (out * 255).astype(np.uint8)


def vis_disparity(disp: np.ndarray, cmap: str = "inferno") -> np.ndarray:
    """[H, W] disparity -> [H, W, 3] uint8 (normalized by max)."""
    return _colormap(disp / max(float(disp.max()), 1e-6), cmap)


def viz_depth_tensor(depth: np.ndarray, vmin: float = None, vmax: float = None) -> np.ndarray:
    """[H, W] metric depth -> plasma colormap of inverse depth (reference :92-107)."""
    inv = 1.0 / np.maximum(depth, 1e-6)
    vmin = inv.min() if vmin is None else vmin
    vmax = inv.max() if vmax is None else vmax
    norm = (inv - vmin) / max(vmax - vmin, 1e-6)
    return _colormap(norm, "plasma")


# KITTI disparity error colormap: (bounds in EPE/noc-EPE space, RGB)
_KITTI_ERR_COLORMAP = [
    (0.0, 0.1875, (49, 54, 149)),
    (0.1875, 0.375, (69, 117, 180)),
    (0.375, 0.75, (116, 173, 209)),
    (0.75, 1.5, (171, 217, 233)),
    (1.5, 3.0, (224, 243, 248)),
    (3.0, 6.0, (254, 224, 144)),
    (6.0, 12.0, (253, 174, 97)),
    (12.0, 24.0, (244, 109, 67)),
    (24.0, 48.0, (215, 48, 39)),
    (48.0, float("inf"), (165, 0, 38)),
]


def disp_error_img(disp_pred: np.ndarray, disp_gt: np.ndarray, abs_thres: float = 3.0,
                   rel_thres: float = 0.05) -> np.ndarray:
    """KITTI-style disparity error visualization [H, W, 3] uint8 (reference :19-59)."""
    valid = disp_gt > 0
    err = np.abs(disp_pred - disp_gt)
    norm_err = np.minimum(err / abs_thres, err / np.maximum(disp_gt, 1e-6) / rel_thres)
    out = np.zeros(disp_gt.shape + (3,), np.uint8)
    for lo, hi, color in _KITTI_ERR_COLORMAP:
        m = (norm_err >= lo) & (norm_err < hi) & valid
        out[m] = color
    return out
