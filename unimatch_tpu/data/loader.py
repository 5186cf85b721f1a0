"""Host-side training data pipeline: shuffle, shard, batch, prefetch.

The reference uses torch DataLoader with DistributedSampler (per-epoch seed,
main_flow.py:377-380, :413-414). TPU-native equivalent: a thread-pool loader
producing numpy batches, sharded per host (each host loads only its slice of
the global batch), with per-epoch reshuffling seeded by epoch, and
double-buffered device prefetch so the TPU never waits on augmentation.
"""

from __future__ import annotations

import multiprocessing as mp
import queue
import threading
from typing import Dict, Iterator, Optional

import numpy as np


def _mp_worker(dataset, seed, epoch, jobs, out_q):
    """Forked worker: load + augment its share of batches, push (index, batch)."""
    from unimatch_tpu.data.rng import sample_rng_scope

    for bi, batch_idx in jobs:
        samples = []
        for j in batch_idx:
            with sample_rng_scope(seed, epoch, int(j)):
                samples.append(dataset[int(j)])
        out = {k: np.stack([s[k] for s in samples]) for k in samples[0] if k != "extra"}
        out_q.put((bi, out))


class DataLoader:
    """Epoch-based shuffling batch loader.

    Worker model: `use_processes=True` forks one process per worker (the
    torch-DataLoader equivalent; augmentation is numpy/cv2-heavy and mostly
    GIL-bound, so threads plateau at ~2 workers — measured in
    scripts/bench_loader.py); the default thread mode keeps zero-copy
    handoff for small datasets and tests. Either way, augmentation streams
    are seeded per (seed, epoch, sample), so results are identical across
    worker counts and worker models.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_workers: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
        use_processes: bool = False,
    ):
        assert batch_size % 1 == 0
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_workers = max(1, num_workers)
        self.seed = seed
        self.drop_last = drop_last
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.use_processes = use_processes and hasattr(mp, "get_context")
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reshuffle for a new epoch (DistributedSampler.set_epoch parity)."""
        self.epoch = epoch

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            rng = np.random.RandomState(self.seed + self.epoch)
            rng.shuffle(idx)
        # per-host shard of the global order
        return idx[self.shard_index :: self.num_shards]

    def __len__(self) -> int:
        n = len(self._epoch_indices())
        return n // self.batch_size if self.drop_last else -(-n // self.batch_size)

    def __iter__(self) -> Iterator[Dict[str, np.ndarray]]:
        if self.use_processes:
            yield from self._iter_processes()
            return
        yield from self._iter_threads()

    def _iter_processes(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        nb = len(self)
        batches = [indices[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]
        jobs = list(enumerate(batches))

        ctx = mp.get_context("fork")  # inherit the dataset without pickling it
        out_q = ctx.Queue(maxsize=self.num_workers * 2)
        procs = []
        for w in range(self.num_workers):
            p = ctx.Process(
                target=_mp_worker,
                args=(self.dataset, self.seed, self.epoch, jobs[w :: self.num_workers], out_q),
                daemon=True,
            )
            p.start()
            procs.append(p)

        pending: Dict[int, Dict[str, np.ndarray]] = {}
        try:
            for want in range(nb):
                while want not in pending:
                    bi, out = out_q.get()
                    pending[bi] = out
                yield pending.pop(want)
        finally:
            for p in procs:
                p.terminate()
            for p in procs:
                p.join(timeout=2)

    def _iter_threads(self) -> Iterator[Dict[str, np.ndarray]]:
        indices = self._epoch_indices()
        nb = len(self)
        batches = [indices[i * self.batch_size : (i + 1) * self.batch_size] for i in range(nb)]

        sample_q: "queue.Queue" = queue.Queue(maxsize=self.num_workers * 2)
        stop = threading.Event()

        from unimatch_tpu.data.rng import sample_rng_scope

        epoch = self.epoch

        def fetch(j):
            # per-(seed, epoch, index) augmentation stream: reproducible for
            # any num_workers / scheduling (reference seeds per *worker*,
            # dataloader/flow/datasets.py:61-67 — this is strictly stronger)
            with sample_rng_scope(self.seed, epoch, j):
                return self.dataset[int(j)]

        def worker(batch_list):
            for bi, batch_idx in batch_list:
                if stop.is_set():
                    return
                samples = [fetch(int(j)) for j in batch_idx]
                out = {
                    k: np.stack([s[k] for s in samples]) for k in samples[0] if k != "extra"
                }
                sample_q.put((bi, out))

        jobs = list(enumerate(batches))
        threads = []
        for w in range(self.num_workers):
            t = threading.Thread(target=worker, args=(jobs[w :: self.num_workers],), daemon=True)
            t.start()
            threads.append(t)

        # re-order worker outputs into deterministic batch order
        pending: Dict[int, Dict[str, np.ndarray]] = {}
        try:
            for want in range(nb):
                while want not in pending:
                    bi, out = sample_q.get()
                    pending[bi] = out
                yield pending.pop(want)
        finally:
            stop.set()
            # drain so workers blocked on put() can exit
            while not sample_q.empty():
                sample_q.get_nowait()


def device_prefetch(iterator, mesh=None, size: int = 2):
    """Move batches to device ahead of consumption (double buffering).

    With a mesh, batches are placed batch-sharded across the `data` axis.
    """
    import jax

    from unimatch_tpu.parallel.mesh import shard_batch

    buf = []
    it = iter(iterator)

    def put(batch):
        if mesh is not None:
            return shard_batch(mesh, batch)
        return jax.tree.map(jax.numpy.asarray, batch)

    try:
        for _ in range(size):
            buf.append(put(next(it)))
    except StopIteration:
        pass
    while buf:
        out = buf.pop(0)
        try:
            buf.append(put(next(it)))
        except StopIteration:
            pass
        yield out
