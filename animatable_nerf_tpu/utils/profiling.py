"""Profiling & throughput observability.

The reference's tracing story is ad-hoc wall-clock timing with explicit
cuda synchronize (run.py:32-38, lib/train/trainers/trainer.py:54-97,
SURVEY.md §5). Here profiling is first-class:

  * `profile_trace` — jax.profiler trace context writing a TensorBoard-
    loadable trace (XLA ops, fusion boundaries, Pallas kernels).
  * `ThroughputMeter` — windowed rays/sec / points/sec counters, the
    perf numbers the driver benchmarks track (BASELINE.md).
  * `StepTimer` — device-synchronized section timing for quick in-place
    measurements without a full trace.
"""

from __future__ import annotations

import contextlib
import time
from collections import deque

import jax


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """Capture a jax.profiler trace for the enclosed block.

    View with: tensorboard --logdir <log_dir> (Profile tab), or process
    the .pb trace offline.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ThroughputMeter:
    """Windowed throughput: call `update(n_items, seconds)` per step."""

    def __init__(self, window: int = 20):
        self._samples = deque(maxlen=window)

    def update(self, n_items: float, seconds: float):
        if seconds > 0:
            self._samples.append((n_items, seconds))

    @property
    def per_sec(self) -> float:
        if not self._samples:
            return 0.0
        items = sum(n for n, _ in self._samples)
        secs = sum(s for _, s in self._samples)
        return items / max(secs, 1e-9)


class StepTimer:
    """Synchronized section timing.

    with StepTimer() as t:
        out = step(...)
        t.sync(out)        # block on device work before stopping
    print(t.ms)
    """

    def __enter__(self):
        self._t0 = time.perf_counter()
        self.ms = 0.0
        return self

    def sync(self, tree):
        jax.block_until_ready(tree)

    def __exit__(self, *exc):
        self.ms = (time.perf_counter() - self._t0) * 1e3
        return False
