"""Host data-pipeline throughput benchmark (CPU only — no TPU required).

Measures augmentation+batching throughput of unimatch_tpu.data.DataLoader on a
synthetic Sintel-style dataset at a realistic training crop, across worker
counts, and reports samples/sec. Compare against the training step time to
confirm the loader can feed the chip (see docs/PERF_NOTES.md "Data pipeline").

Usage: python scripts/bench_loader.py [--size 368x768] [--batches 20] [--bs 8]
"""

import argparse
import os
import sys
import tempfile
import time

import numpy as np
from PIL import Image


def make_dataset(root, n_pairs, h, w):
    from unimatch_tpu.utils import frame_utils

    rng = np.random.RandomState(0)
    scene = os.path.join(root, "training", "clean", "scene_0")
    flows = os.path.join(root, "training", "flow", "scene_0")
    os.makedirs(scene, exist_ok=True)
    os.makedirs(flows, exist_ok=True)
    for f in range(n_pairs + 1):
        img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
        Image.fromarray(img).save(os.path.join(scene, f"frame_{f:04d}.png"))
        if f < n_pairs:
            flow = (rng.randn(h, w, 2) * 8).astype(np.float32)
            frame_utils.write_flo(os.path.join(flows, f"frame_{f:04d}.flo"), flow)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", default="368x768", help="source image HxW")
    ap.add_argument("--crop", default="320x640", help="train crop HxW")
    ap.add_argument("--bs", type=int, default=8)
    ap.add_argument("--batches", type=int, default=16)
    ap.add_argument("--pairs", type=int, default=64)
    ap.add_argument("--workers", default="1,2,4,8")
    args = ap.parse_args()

    h, w = (int(v) for v in args.size.split("x"))
    ch, cw = (int(v) for v in args.crop.split("x"))

    from unimatch_tpu.data.flow_datasets import MpiSintel
    from unimatch_tpu.data.loader import DataLoader

    with tempfile.TemporaryDirectory() as root:
        make_dataset(root, args.pairs, h, w)
        aug = {"crop_size": (ch, cw), "min_scale": -0.1, "max_scale": 1.0, "do_flip": True}
        ds = MpiSintel(aug_params=aug, split="training", dstype="clean", root=root)

        print(f"dataset: {len(ds)} samples {h}x{w} -> crop {ch}x{cw}, bs={args.bs}")
        for use_proc in (False, True):
            for nw in (int(v) for v in args.workers.split(",")):
                loader = DataLoader(ds, batch_size=args.bs, shuffle=True, num_workers=nw,
                                    seed=0, use_processes=use_proc)
                it = iter(loader)
                next(it)  # warm caches / worker startup
                t0 = time.perf_counter()
                n = 0
                for _ in range(args.batches - 1):
                    try:
                        next(it)
                        n += 1
                    except StopIteration:
                        loader.set_epoch(loader.epoch + 1)
                        it = iter(loader)
                dt = time.perf_counter() - t0
                sps = n * args.bs / dt
                kind = "proc" if use_proc else "thread"
                print(f"{kind} workers={nw}: {sps:7.1f} samples/s  ({1000*dt/max(n,1):.1f} ms/batch)")


if __name__ == "__main__":
    main()
