"""File formats for flow / disparity / depth datasets.

Capability parity with reference utils/frame_utils.py and utils/file_io.py:
  .flo (Middlebury)          read/write
  .pfm (Freiburg/Middlebury) read/write
  KITTI 16-bit flow png      read/write
  KITTI 16-bit disparity png read/write
  generic images             read (PIL)

All functions use numpy HWC float32 arrays; flow arrays are [H, W, 2] (x, y).
"""

from __future__ import annotations

import re
from typing import Optional, Tuple

import numpy as np
from PIL import Image

FLO_MAGIC = 202021.25


def read_flo(path: str) -> np.ndarray:
    """Middlebury .flo -> [H, W, 2] float32."""
    with open(path, "rb") as f:
        magic = np.fromfile(f, np.float32, count=1)[0]
        if magic != FLO_MAGIC:
            raise ValueError(f"{path}: bad .flo magic {magic}")
        w = int(np.fromfile(f, np.int32, count=1)[0])
        h = int(np.fromfile(f, np.int32, count=1)[0])
        data = np.fromfile(f, np.float32, count=2 * w * h)
    return data.reshape(h, w, 2)


def write_flo(path: str, flow: np.ndarray) -> None:
    flow = np.asarray(flow, np.float32)
    h, w, c = flow.shape
    assert c == 2
    with open(path, "wb") as f:
        np.float32(FLO_MAGIC).tofile(f)
        np.int32(w).tofile(f)
        np.int32(h).tofile(f)
        flow.tofile(f)


def read_pfm(path: str) -> Tuple[np.ndarray, float]:
    """PFM -> (data [H, W] or [H, W, 3], scale). Rows are flipped to top-down."""
    with open(path, "rb") as f:
        header = f.readline().rstrip()
        if header == b"PF":
            color = True
        elif header == b"Pf":
            color = False
        else:
            raise ValueError(f"{path}: not a PFM file")
        dims = f.readline()
        while dims.startswith(b"#"):  # skip comments
            dims = f.readline()
        m = re.match(rb"^(\d+)\s(\d+)\s*$", dims)
        if not m:
            raise ValueError(f"{path}: malformed PFM header")
        w, h = int(m.group(1)), int(m.group(2))
        scale = float(f.readline().rstrip())
        endian = "<" if scale < 0 else ">"
        scale = abs(scale)
        data = np.fromfile(f, endian + "f")
    shape = (h, w, 3) if color else (h, w)
    return np.flipud(data.reshape(shape)).copy(), scale


def write_pfm(path: str, image: np.ndarray, scale: float = 1.0) -> None:
    image = np.asarray(image, np.float32)
    if image.ndim == 3 and image.shape[2] == 3:
        color = True
    elif image.ndim == 2 or (image.ndim == 3 and image.shape[2] == 1):
        color = False
        image = image.reshape(image.shape[0], image.shape[1])
    else:
        raise ValueError("PFM: image must be HxW, HxWx1 or HxWx3")
    with open(path, "wb") as f:
        f.write(b"PF\n" if color else b"Pf\n")
        f.write(f"{image.shape[1]} {image.shape[0]}\n".encode())
        endian = image.dtype.byteorder
        if endian == "<" or (endian == "=" and np.little_endian):
            scale = -scale
        f.write(f"{scale}\n".encode())
        np.flipud(image).tofile(f)


def read_kitti_flow_png(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit flow png -> (flow [H, W, 2], valid [H, W])."""
    import cv2

    raw = cv2.imread(path, cv2.IMREAD_ANYDEPTH | cv2.IMREAD_COLOR)
    raw = raw[:, :, ::-1].astype(np.float32)  # BGR -> RGB = (u, v, valid)
    flow = (raw[:, :, :2] - 2**15) / 64.0
    valid = raw[:, :, 2]
    return flow, valid


def write_kitti_flow_png(path: str, flow: np.ndarray, valid: Optional[np.ndarray] = None) -> None:
    import cv2

    h, w, _ = flow.shape
    out = np.zeros((h, w, 3), np.uint16)
    out[:, :, :2] = np.clip(flow * 64.0 + 2**15, 0, 65535).astype(np.uint16)
    out[:, :, 2] = 1 if valid is None else valid.astype(np.uint16)
    cv2.imwrite(path, out[:, :, ::-1])  # RGB -> BGR


def read_kitti_disp_png(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """KITTI 16-bit disparity png -> (disp [H, W], valid [H, W])."""
    disp = np.asarray(Image.open(path), np.float32)
    valid = disp > 0
    return disp / 256.0, valid


def write_kitti_disp_png(path: str, disp: np.ndarray) -> None:
    out = np.clip(disp * 256.0, 0, 65535).astype(np.uint16)
    Image.fromarray(out).save(path)


def read_image(path: str) -> np.ndarray:
    """Any image -> [H, W, 3] float32 in [0, 255]."""
    img = Image.open(path)
    if img.mode != "RGB":
        img = img.convert("RGB")
    return np.asarray(img, np.float32)


def read_gen(path: str):
    """Dispatch by extension, mirroring the reference's readers."""
    lower = path.lower()
    if lower.endswith(".flo"):
        return read_flo(path)
    if lower.endswith(".pfm"):
        data, _ = read_pfm(path)
        return data
    if lower.endswith((".png", ".jpg", ".jpeg", ".ppm", ".bmp", ".webp")):
        return read_image(path)
    raise ValueError(f"unsupported file: {path}")
