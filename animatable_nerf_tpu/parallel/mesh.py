"""Device-mesh helpers for SPMD training.

The reference scales with NCCL DistributedDataParallel
(train_net.py:93-98, trainer.py:14-18): one process per GPU, per-rank
dataset shards, all-reduced gradients. The TPU equivalent here is a
single jitted program over a `jax.sharding.Mesh`:

  * the frame axis of the batch is sharded over the 'dp' mesh axis
    (each device trains on its own frame — exactly DDP's semantics),
  * params are replicated; XLA inserts the gradient all-reduce over ICI
    when the loss averages across the sharded axis,
  * multi-host runs reuse the same program via jax.distributed.initialize
    with per-host data sharding keyed on jax.process_index()
    (mirrors lib/datasets/samplers.py:75-131).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def shard_batch(batch: dict, mesh: Mesh, axis: str = "dp",
                leading_steps: bool = False):
    """Place every array with its frame axis sharded over dp.

    leading_steps=True handles multi-step dispatch batches shaped
    (K, B, ...): the scan axis K stays replicated, axis 1 (frames)
    shards over dp."""
    sh = NamedSharding(mesh, P(None, axis) if leading_steps else P(axis))
    return {k: jax.device_put(v, sh) for k, v in batch.items()}


def replicate(tree, mesh: Mesh):
    sh = NamedSharding(mesh, P())
    return jax.device_put(tree, sh)
