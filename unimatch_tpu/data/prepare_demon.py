"""DeMoN dataset preparation: extract h5 archives to jpg/npy scene dirs.

Capability parity with reference dataloader/depth/prepare_demon_train.py and
prepare_demon_test.py: reads the DeMoN .h5 files (sequences of views with
images, depths, camera intrinsics and poses), writes per-scene directories
with %04d.jpg images, %04d.npy depths, cam.txt (3x3 K) and poses.txt
(one 3x4 row-major [R|t] per line).

Usage:
  python -m unimatch_tpu.data.prepare_demon --input datasets/demon_h5 \
      --output datasets/Demon/train --split train
"""

from __future__ import annotations

import argparse
import os
from glob import glob

import numpy as np

TRAIN_DATASETS = ("sun3d", "rgbd", "scenes11")
TEST_DATASETS = ("sun3d", "rgbd", "scenes11", "mvs")


def _dump_sequence(group, out_dir: str) -> int:
    """Write one h5 sequence group to out_dir; returns number of views."""
    from PIL import Image

    frames = group["frames"]["t0"]
    view_names = sorted(frames.keys(), key=lambda v: int(v[1:]))  # v0, v1, ...

    os.makedirs(out_dir, exist_ok=True)
    poses = []
    K_out = None
    for i, vname in enumerate(view_names):
        view = frames[vname]
        img = np.asarray(view["image"])
        if img.ndim == 1:  # JPEG-encoded bytes
            import io

            img = np.asarray(Image.open(io.BytesIO(img.tobytes())))
        Image.fromarray(img).save(os.path.join(out_dir, f"{i:04d}.jpg"), quality=95)

        depth = np.asarray(view["depth"], np.float32)
        if depth.ndim == 1:
            h, w = img.shape[:2]
            depth = depth.reshape(h, w)
        np.save(os.path.join(out_dir, f"{i:04d}.npy"), depth)

        cam = view["camera"]
        vals = np.asarray(cam, np.float64).reshape(-1)
        # DeMoN camera: fx, fy, skew, cx, cy then R (rotation) and t
        fx, fy, skew, cx, cy = vals[:5]
        h, w = depth.shape
        K_out = np.array(
            [[fx * w, skew, cx * w], [0, fy * h, cy * h], [0, 0, 1]], np.float64
        )
        R = vals[5:14].reshape(3, 3)
        t = vals[14:17]
        poses.append(np.concatenate([R, t[:, None]], axis=1).reshape(-1))

    np.savetxt(os.path.join(out_dir, "cam.txt"), K_out)
    np.savetxt(os.path.join(out_dir, "poses.txt"), np.stack(poses))
    return len(view_names)


def prepare(input_dir: str, output_dir: str, split: str = "train") -> None:
    import h5py

    datasets = TRAIN_DATASETS if split == "train" else TEST_DATASETS
    h5_files = sorted(glob(os.path.join(input_dir, "*.h5")))
    if not h5_files:
        raise FileNotFoundError(f"no .h5 files under {input_dir}")

    n_scenes = 0
    for path in h5_files:
        base = os.path.splitext(os.path.basename(path))[0]
        if not any(d in base for d in datasets):
            continue
        with h5py.File(path, "r") as f:
            for seq_name in f.keys():
                out = os.path.join(output_dir, f"{base}_{split}_{seq_name}")
                try:
                    _dump_sequence(f[seq_name], out)
                    n_scenes += 1
                except Exception as e:  # malformed sequences exist in DeMoN
                    print(f"skip {path}:{seq_name}: {e}")
    print(f"wrote {n_scenes} scenes to {output_dir}")


if __name__ == "__main__":
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--split", default="train", choices=["train", "test"])
    a = p.parse_args()
    prepare(a.input, a.output, a.split)
