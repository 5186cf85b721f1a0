"""Data layer: synthetic dataset directories, augmentors, loader invariants."""

import os

import numpy as np
import pytest
from PIL import Image

from unimatch_tpu.data.flow_datasets import MpiSintel, KITTI, ConcatFlowDataset
from unimatch_tpu.data.loader import DataLoader
from unimatch_tpu.data.transforms_flow import FlowAugmentor, SparseFlowAugmentor
from unimatch_tpu.utils import frame_utils


def _make_sintel(root, scenes=2, frames=3, h=64, w=96):
    rng = np.random.RandomState(0)
    for s in range(scenes):
        scene = f"scene_{s}"
        os.makedirs(os.path.join(root, "training", "clean", scene), exist_ok=True)
        os.makedirs(os.path.join(root, "training", "flow", scene), exist_ok=True)
        for f in range(frames):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "training", "clean", scene, f"frame_{f:04d}.png")
            )
            if f < frames - 1:
                flow = (rng.randn(h, w, 2) * 4).astype(np.float32)
                frame_utils.write_flo(
                    os.path.join(root, "training", "flow", scene, f"frame_{f:04d}.flo"), flow
                )


def _make_kitti(root, n=3, h=64, w=96):
    rng = np.random.RandomState(1)
    os.makedirs(os.path.join(root, "training", "image_2"), exist_ok=True)
    os.makedirs(os.path.join(root, "training", "flow_occ"), exist_ok=True)
    for i in range(n):
        for suffix in ("10", "11"):
            img = (rng.rand(h, w, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(
                os.path.join(root, "training", "image_2", f"{i:06d}_{suffix}.png")
            )
        flow = np.round((rng.randn(h, w, 2) * 4) * 64) / 64
        valid = (rng.rand(h, w) > 0.5).astype(np.uint16)
        frame_utils.write_kitti_flow_png(
            os.path.join(root, "training", "flow_occ", f"{i:06d}_10.png"),
            flow.astype(np.float32), valid,
        )


def test_sintel_dataset_and_mixing(tmp_path):
    root = str(tmp_path / "Sintel")
    _make_sintel(root)
    ds = MpiSintel(aug_params=None, split="training", dstype="clean", root=root)
    assert len(ds) == 4  # 2 scenes x 2 pairs
    s = ds[0]
    assert s["img0"].shape == (64, 96, 3)
    assert s["flow_gt"].shape == (64, 96, 2)
    assert s["valid"].min() >= 0

    mixed = 3 * MpiSintel(aug_params=None, split="training", dstype="clean", root=root) + ds
    assert len(mixed) == 16
    assert isinstance(mixed, ConcatFlowDataset)
    _ = mixed[15]


def test_kitti_sparse_dataset(tmp_path):
    root = str(tmp_path / "KITTI")
    _make_kitti(root)
    ds = KITTI(aug_params=None, split="training", root=root)
    assert len(ds) == 3
    s = ds[0]
    assert s["valid"].shape == (64, 96)
    assert set(np.unique(s["valid"])) <= {0.0, 1.0}


def test_flow_augmentor_shapes(rng):
    aug = FlowAugmentor(crop_size=(48, 64))
    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    flow = (rng.randn(64, 96, 2) * 3).astype(np.float32)
    np.random.seed(0)
    i1, i2, f = aug(img.copy(), img.copy(), flow)
    assert i1.shape == (48, 64, 3) and f.shape == (48, 64, 2)


def test_sparse_augmentor_preserves_validity(rng):
    aug = SparseFlowAugmentor(crop_size=(48, 64))
    img = (rng.rand(64, 96, 3) * 255).astype(np.uint8)
    flow = (rng.randn(64, 96, 2) * 3).astype(np.float32)
    valid = (rng.rand(64, 96) > 0.5).astype(np.float32)
    np.random.seed(0)
    i1, i2, f, v = aug(img.copy(), img.copy(), flow, valid)
    assert f.shape == (48, 64, 2) and v.shape == (48, 64)
    assert set(np.unique(v)) <= {0, 1}


def test_loader_epoch_shuffle_and_shard(tmp_path):
    root = str(tmp_path / "Sintel")
    _make_sintel(root, scenes=4, frames=4)

    ds = MpiSintel(aug_params=None, split="training", dstype="clean", root=root)
    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=3)
    b0 = [b["img0"].sum() for b in loader]
    loader.set_epoch(1)
    b1 = [b["img0"].sum() for b in loader]
    assert len(b0) == len(b1) == len(ds) // 2
    assert b0 != b1  # reshuffled

    # deterministic order for the same epoch
    loader.set_epoch(1)
    b1_again = [b["img0"].sum() for b in loader]
    assert b1 == b1_again

    # two shards partition the epoch
    l0 = DataLoader(ds, batch_size=2, seed=3, shard_index=0, num_shards=2)
    l1 = DataLoader(ds, batch_size=2, seed=3, shard_index=1, num_shards=2)
    n0 = sum(1 for _ in l0)
    n1 = sum(1 for _ in l1)
    assert n0 == n1 == len(ds) // 2 // 2


def test_loader_augmentation_deterministic_across_worker_counts(tmp_path):
    """Per-sample (seed, epoch, index) RNG: identical augmented batches for
    any num_workers (the reference only guarantees per-worker streams)."""
    root = str(tmp_path / "Sintel")
    _make_sintel(root, scenes=2, frames=4)

    def batches(num_workers):
        ds = MpiSintel(aug_params={"crop_size": (48, 64)}, split="training",
                       dstype="clean", root=root)
        loader = DataLoader(ds, batch_size=2, num_workers=num_workers, seed=7)
        loader.set_epoch(2)
        return [b for b in loader]

    b1 = batches(1)
    b4 = batches(4)
    assert len(b1) == len(b4) > 0
    for x, y in zip(b1, b4):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])

    # different epoch -> different augmentation stream
    ds = MpiSintel(aug_params={"crop_size": (48, 64)}, split="training",
                   dstype="clean", root=root)
    loader = DataLoader(ds, batch_size=2, num_workers=2, seed=7, shuffle=False)
    loader.set_epoch(0)
    e0 = [b["img0"].copy() for b in loader]
    loader.set_epoch(1)
    e1 = [b["img0"].copy() for b in loader]
    assert any((a != b).any() for a, b in zip(e0, e1))


def test_loader_process_workers_match_threads(tmp_path):
    """Process-worker mode yields byte-identical batches to thread mode
    (per-sample seeding is worker-model independent)."""
    root = str(tmp_path / "Sintel")
    _make_sintel(root, scenes=2, frames=4)

    def batches(use_processes):
        ds = MpiSintel(aug_params={"crop_size": (48, 64)}, split="training",
                       dstype="clean", root=root)
        loader = DataLoader(ds, batch_size=2, num_workers=2, seed=7,
                            use_processes=use_processes)
        loader.set_epoch(1)
        return [b for b in loader]

    bt = batches(False)
    bp = batches(True)
    assert len(bt) == len(bp) > 0
    for x, y in zip(bt, bp):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k])
