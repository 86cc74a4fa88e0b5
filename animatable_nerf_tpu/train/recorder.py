"""Training recorder: windowed-median smoothed scalars, console lines with
ETA, and on-disk scalar logs.

Reference: lib/train/recorder.py (SmoothedValue windows, tensorboardX
writer, rank-0 gating, record-dir wipe on fresh runs, checkpointed step).
tensorboardX isn't available in this image; scalars go to a JSONL file a
TensorBoard exporter can ingest, and the tensorboardX writer is used when
importable.
"""

from __future__ import annotations

import json
import os
import shutil
import time
from collections import defaultdict, deque

import numpy as np


class SmoothedValue:
    """Windowed median/average (recorder.py:10-37)."""

    def __init__(self, window_size: int = 20):
        self.deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0

    def update(self, value):
        v = float(value)
        self.deque.append(v)
        self.count += 1
        self.total += v

    @property
    def median(self):
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self):
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self):
        return self.total / max(self.count, 1)


class Recorder:
    def __init__(self, record_dir: str, resume: bool = True, is_main: bool = True):
        self.record_dir = record_dir
        self.is_main = is_main
        self.step = 0
        self.epoch = 0
        self.scalars = defaultdict(SmoothedValue)
        self.batch_time = SmoothedValue()
        self.data_time = SmoothedValue()
        self._writer = None
        self._jsonl = None
        if not is_main:
            return
        if not resume and os.path.isdir(record_dir):
            # fresh runs wipe the record dir (recorder.py:46-48)
            shutil.rmtree(record_dir, ignore_errors=True)
        os.makedirs(record_dir, exist_ok=True)
        try:  # optional tensorboard
            from tensorboardX import SummaryWriter  # type: ignore

            self._writer = SummaryWriter(log_dir=record_dir)
        except Exception:
            self._writer = None
        self._jsonl = open(os.path.join(record_dir, "scalars.jsonl"), "a")

    def update_stats(self, stats: dict):
        for k, v in stats.items():
            self.scalars[k].update(float(v))

    def record(self, prefix: str = "train", extra: dict | None = None):
        if not self.is_main:
            return
        payload = {
            "step": self.step,
            "epoch": self.epoch,
            **{k: v.median for k, v in self.scalars.items()},
            **(extra or {}),
        }
        if self._jsonl:
            self._jsonl.write(json.dumps({prefix: payload}) + "\n")
            self._jsonl.flush()
        if self._writer:
            for k, v in payload.items():
                if isinstance(v, (int, float)):
                    self._writer.add_scalar(f"{prefix}/{k}", v, self.step)

    def state_dict(self):
        return {"step": self.step}

    def load_state_dict(self, state):
        self.step = int(state.get("step", 0))

    def log_line(self, max_iter: int, lr: float, extra: str = ""):
        """Console progress string (trainer.py:87-97)."""
        eta_sec = self.batch_time.global_avg * (max_iter - self.step)
        eta = time.strftime("%H:%M:%S", time.gmtime(max(eta_sec, 0)))
        parts = [f"eta: {eta}", f"epoch: {self.epoch}", f"step: {self.step}"]
        parts += [f"{k}: {v.median:.4f}" for k, v in self.scalars.items()]
        parts += [
            f"data: {self.data_time.median:.4f}",
            f"batch: {self.batch_time.median:.4f}",
            f"lr: {lr:.6f}",
        ]
        if extra:
            parts.append(extra)
        return "  ".join(parts)
