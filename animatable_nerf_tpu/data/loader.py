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
    """Evaluate every k-th frame (samplers.py:134-152): the frame WINDOW
    [begin : begin + count] is cut first (count = -1 falls back to the
    dataset's num_train_frame cap, per the reference), then strided by
    `interval`."""

    def __init__(self, dataset, interval: int = 30, begin: int = 0,
                 count: int = -1, default_count: int | None = None):
        n_frames = len(dataset) // dataset.num_cams
        inds = np.arange(len(dataset)).reshape(n_frames, dataset.num_cams)
        if count < 0:
            count = default_count if default_count is not None else n_frames
        self.inds = inds[begin : begin + count][::interval].ravel()

    def __iter__(self):
        return iter(self.inds.tolist())

    def __len__(self):
        return len(self.inds)


class ImageSizeBatchSampler:
    """Batches of (index, h, w) with a shared random crop size per batch
    (samplers.py:10-47). The reference keeps this from its ancestor
    codebase but no shipped config selects it (`train.batch_sampler` is
    'default' everywhere, config.py:70) and the shipped datasets index
    by plain int — ported for parity/completeness.

    strategy 'origin' yields (-1, -1) sizes (use the native image size);
    'range' draws h/w uniformly from [min_hw, max_hw] and rounds UP to
    the next multiple of 32 via the reference's bit trick
    ((x | 31) + 1)."""

    def __init__(self, sampler, batch_size: int, drop_last: bool,
                 min_hw=(256, 256), max_hw=(480, 640),
                 strategy: str = "range", seed=None):
        self.sampler = sampler
        self.batch_size = batch_size
        self.drop_last = drop_last
        self.strategy = strategy
        self.hmin, self.wmin = min_hw
        self.hmax, self.wmax = max_hw
        self.divisor = 32
        self._rng = np.random.RandomState(seed)

    def _hw(self):
        if self.strategy == "origin":
            return -1, -1
        h = self._rng.randint(self.hmin, self.hmax + 1)
        w = self._rng.randint(self.wmin, self.wmax + 1)
        return (h | (self.divisor - 1)) + 1, (w | (self.divisor - 1)) + 1

    def __iter__(self):
        batch = []
        h, w = self._hw()
        for idx in self.sampler:
            batch.append((idx, h, w))
            if len(batch) == self.batch_size:
                yield batch
                h, w = self._hw()
                batch = []
        if batch and not self.drop_last:
            yield batch

    def __len__(self):
        n = len(self.sampler)
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size


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
        q: queue.Queue = queue.Queue()
        stop = threading.Event()
        it = iter(enumerate(inds))
        lock = threading.Lock()
        results: dict = {}
        next_out = [0]
        # bounds TOTAL in-flight items (queued + parked in `results`):
        # without it, one slow head-of-line item lets workers buffer the
        # rest of the epoch in memory
        tickets = threading.Semaphore(self.prefetch + self.num_threads)

        def worker():
            while not stop.is_set():
                # acquire an in-flight ticket, observing stop
                while not tickets.acquire(timeout=0.1):
                    if stop.is_set():
                        return
                with lock:
                    try:
                        pos, idx = next(it)
                    except StopIteration:
                        tickets.release()
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
                tickets.release()  # one in-flight slot freed
                next_out[0] += 1
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()
