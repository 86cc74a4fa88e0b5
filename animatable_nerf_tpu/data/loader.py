"""Batching, samplers and a prefetching loader.

Reference counterparts: lib/datasets/samplers.py (FrameSampler,
IterationBasedBatchSampler, DistributedSampler) and make_dataset.py.
Instead of torch DataLoader worker processes we use a thread pool with
double-buffered prefetch — the heavy lifting (cv2 undistort/resize) drops
the GIL, and per-host sharding replaces the DistributedSampler
(samplers.py:75-131) keyed on jax.process_index().
"""

from __future__ import annotations

import queue
import threading

import numpy as np


class FrameSampler:
    """Evaluate every k-th frame (samplers.py:134-152)."""

    def __init__(self, dataset, interval: int = 30, begin: int = 0, count: int = -1):
        n_frames = len(dataset) // dataset.num_cams
        inds = np.arange(len(dataset)).reshape(n_frames, dataset.num_cams)
        inds = inds[::interval].ravel()
        if count >= 0:
            inds = inds[begin * dataset.num_cams : (begin + count) * dataset.num_cams]
        self.inds = inds

    def __iter__(self):
        return iter(self.inds.tolist())

    def __len__(self):
        return len(self.inds)


class Loader:
    """Iterates a dataset with shuffling, iteration-based epochs and
    per-host sharding; prefetches `prefetch` items ahead on threads."""

    def __init__(
        self,
        dataset,
        shuffle: bool = True,
        max_iter: int = -1,
        sampler=None,
        seed: int = 0,
        num_shards: int = 1,
        shard_id: int = 0,
        prefetch: int = 4,
        num_threads: int = 4,
    ):
        self.dataset = dataset
        self.shuffle = shuffle
        self.max_iter = max_iter
        self.sampler = sampler
        self.seed = seed
        self.num_shards = num_shards
        self.shard_id = shard_id
        self.prefetch = prefetch
        self.num_threads = num_threads
        self.epoch = 0

    def set_epoch(self, epoch: int):
        """Epoch-seeded shuffle, as in the reference DistributedSampler
        (samplers.py:107-115)."""
        self.epoch = epoch

    def _indices(self):
        if self.sampler is not None:
            inds = list(self.sampler)
        else:
            inds = list(range(len(self.dataset)))
            if self.shuffle:
                rng = np.random.RandomState(self.seed + self.epoch)
                rng.shuffle(inds)
        # per-host shard
        inds = inds[self.shard_id :: self.num_shards]
        if self.max_iter > 0:
            reps = int(np.ceil(self.max_iter / max(len(inds), 1)))
            inds = (inds * reps)[: self.max_iter]
        return inds

    def __len__(self):
        return len(self._indices())

    def __iter__(self):
        inds = self._indices()
        q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()
        it = iter(enumerate(inds))
        lock = threading.Lock()
        results: dict = {}
        next_out = [0]

        def worker():
            while not stop.is_set():
                with lock:
                    try:
                        pos, idx = next(it)
                    except StopIteration:
                        return
                try:
                    item = self.dataset[idx]
                except Exception as e:  # surface dataset errors
                    item = e
                q.put((pos, item))

        threads = [
            threading.Thread(target=worker, daemon=True)
            for _ in range(min(self.num_threads, max(len(inds), 1)))
        ]
        for t in threads:
            t.start()

        try:
            for _ in range(len(inds)):
                # emit strictly in-order so runs are reproducible
                while next_out[0] not in results:
                    pos, item = q.get()
                    results[pos] = item
                item = results.pop(next_out[0])
                next_out[0] += 1
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
