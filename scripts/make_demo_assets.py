"""Generate the bundled synthetic demo assets under demo/.

The reference ships real demo footage (demo/flow-davis DAVIS frames,
demo/depth-scannet ScanNet frames+poses+intrinsics — reference
scripts/gmflow_demo.sh, gmdepth_demo.sh). This repo instead bundles small
*synthetic* scenes with the same directory contracts so the demo CLIs and
smoke tests are self-contained (no reference mount, no dataset download):

  demo/flow-davis/       3 jpg frames of a textured scene under a known
                         smooth translation+rotation flow
  demo/depth-scannet/    color/*.jpg, pose/*.txt (cam-to-world),
                         intrinsic/intrinsic_depth.txt — a textured fronto-
                         parallel plane seen from a slowly translating camera
                         (geometrically consistent pairs)

Deterministic (fixed seeds); re-running reproduces identical files.
"""

import os

import numpy as np
from PIL import Image

ROOT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "demo")


def _texture(rng, h, w, octaves=4):
    """Smooth multi-octave random texture in [0, 255], [H, W, 3]."""
    img = np.zeros((h, w, 3), np.float32)
    for o in range(octaves):
        sh, sw = max(2, h >> (octaves - o)), max(2, w >> (octaves - o))
        coarse = rng.rand(sh, sw, 3).astype(np.float32)
        ys = np.linspace(0, sh - 1, h)
        xs = np.linspace(0, sw - 1, w)
        y0 = np.floor(ys).astype(int)
        x0 = np.floor(xs).astype(int)
        y1 = np.minimum(y0 + 1, sh - 1)
        x1 = np.minimum(x0 + 1, sw - 1)
        fy = (ys - y0)[:, None, None]
        fx = (xs - x0)[None, :, None]
        interp = (
            coarse[y0][:, x0] * (1 - fy) * (1 - fx)
            + coarse[y0][:, x1] * (1 - fy) * fx
            + coarse[y1][:, x0] * fy * (1 - fx)
            + coarse[y1][:, x1] * fy * fx
        )
        img += interp / (2**o)
    img -= img.min()
    img /= img.max()
    return (img * 255).astype(np.uint8)


def _warp(img, fx, fy):
    """Backward-warp img by the dense flow (fx, fy) with bilinear sampling."""
    h, w = img.shape[:2]
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    sx = np.clip(xs + fx, 0, w - 1)
    sy = np.clip(ys + fy, 0, h - 1)
    x0 = np.floor(sx).astype(int)
    y0 = np.floor(sy).astype(int)
    x1 = np.minimum(x0 + 1, w - 1)
    y1 = np.minimum(y0 + 1, h - 1)
    wx = (sx - x0)[..., None]
    wy = (sy - y0)[..., None]
    out = (
        img[y0, x0] * (1 - wy) * (1 - wx)
        + img[y0, x1] * (1 - wy) * wx
        + img[y1, x0] * wy * (1 - wx)
        + img[y1, x1] * wy * wx
    )
    return out.astype(np.uint8)


def make_flow_demo():
    out = os.path.join(ROOT, "flow-davis")
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(7)
    h, w = 240, 416
    base = _texture(rng, h, w)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    cx, cy = w / 2, h / 2
    for i in range(3):
        # translation + slight rotation about the center, growing per frame
        t = i * 1.0
        ang = i * 0.01
        fx = -(np.cos(ang) * (xs - cx) - np.sin(ang) * (ys - cy) + cx - xs) - 3.0 * t
        fy = -(np.sin(ang) * (xs - cx) + np.cos(ang) * (ys - cy) + cy - ys) - 1.5 * t
        frame = _warp(base, fx, fy)
        Image.fromarray(frame).save(os.path.join(out, f"{i:05d}.jpg"), quality=92)
    print(f"wrote {out}: 3 frames {h}x{w}")


def make_depth_demo():
    out = os.path.join(ROOT, "depth-scannet")
    for sub in ("color", "pose", "intrinsic"):
        os.makedirs(os.path.join(out, sub), exist_ok=True)
    rng = np.random.RandomState(11)
    h, w = 192, 256
    fx = fy = 220.0
    K = np.array([[fx, 0, w / 2], [0, fy, h / 2], [0, 0, 1]], np.float64)
    K4 = np.eye(4)
    K4[:3, :3] = K
    np.savetxt(os.path.join(out, "intrinsic", "intrinsic_depth.txt"), K4, fmt="%.6f")

    # a textured plane at depth Z=2.5 m; camera translates along +x.
    # the image seen from camera at x-offset d is the base texture shifted by
    # the (constant, plane-induced) disparity fx * d / Z.
    base = _texture(rng, h, w + 64)
    z_plane = 2.5
    for i in range(4):
        d = 0.05 * i  # meters of sideways motion
        shift = fx * d / z_plane
        xs = np.arange(w) + shift
        x0 = np.floor(xs).astype(int)
        frac = (xs - x0)[None, :, None]
        frame = (base[:, x0] * (1 - frac) + base[:, np.minimum(x0 + 1, base.shape[1] - 1)] * frac)
        Image.fromarray(frame.astype(np.uint8)).save(
            os.path.join(out, "color", f"{i:04d}.jpg"), quality=92
        )
        pose = np.eye(4)
        pose[0, 3] = d  # cam-to-world: camera at (d, 0, 0)
        np.savetxt(os.path.join(out, "pose", f"{i:04d}.txt"), pose, fmt="%.6f")
    print(f"wrote {out}: 4 frames {h}x{w}, plane depth {z_plane} m")


def make_stereo_demo():
    """demo/stereo-middlebury: one left/right pair (sorted order: left first),
    right image = left backward-warped by a sloped-plane disparity field."""
    out = os.path.join(ROOT, "stereo-middlebury")
    os.makedirs(out, exist_ok=True)
    rng = np.random.RandomState(23)
    h, w = 224, 320
    left = _texture(rng, h, w + 48)
    ys, xs = np.mgrid[0:h, 0:w].astype(np.float32)
    disp = 6.0 + 10.0 * (1 - ys / h)  # far floor at the bottom, near at top
    right = _warp(left[:, :w], disp, np.zeros_like(disp))
    Image.fromarray(left[:, :w]).save(os.path.join(out, "pair0_im0.png"))
    Image.fromarray(right).save(os.path.join(out, "pair0_im1.png"))
    print(f"wrote {out}: 1 pair {h}x{w}, disparity 6-16 px")


if __name__ == "__main__":
    make_flow_demo()
    make_depth_demo()
    make_stereo_demo()
