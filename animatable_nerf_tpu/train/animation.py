"""Stage-2 training: fit the novel-pose blend-weight field by
consistency with the stage-1 canonical field.

Reference: lib/train/trainers/aninerf_animation_trainer.py (grid models)
and aninerf_sample_animation_trainer.py (KNN models): sample 1024*64
random points in the world box and in the canonical box, push both
through the novel-pose bw field and the frozen canonical bw field, and
smooth-L1 the two blend-weight predictions on density-selected points.

Freezing: everything but `novel_pose_bw` is masked out of the optimizer
(optax.masked — reference :27-31 sets requires_grad=False).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core import world_points_to_pose_points
from .losses import smooth_l1, masked_mean

N_ANIM_SAMPLES = 1024 * 64  # aninerf_animation_trainer.py:131


def uniform_box_points(key, bounds, n: int):
    """Uniform samples inside an AABB (blend_utils.py:171-181)."""
    u = jax.random.uniform(key, (n, 3))
    return bounds[0] + (bounds[1] - bounds[0]) * u


def novel_pose_trainable_mask(params) -> Any:
    """Pytree mask: True only under the novel_pose_bw subtree."""

    def walk(tree, inside):
        if isinstance(tree, dict):
            return {
                k: walk(v, inside or k == "novel_pose_bw") for k, v in tree.items()
            }
        return inside

    return walk(params, False)


def animation_loss(model, params, frame, key, n_samples: int = N_ANIM_SAMPLES):
    """The stage-2 loss for one frame. Returns (loss, stats)."""
    k1, k2 = jax.random.split(key)
    # observation-space branch
    wpts = uniform_box_points(k1, frame["wbounds"], n_samples)
    ppts = world_points_to_pose_points(wpts, frame["R"], frame["Th"])
    pbw0, tbw0, sel0 = model.apply(
        params, ppts, frame, method=model.animation_from_pose
    )
    # canonical-space branch
    tpts = uniform_box_points(k2, frame["tbounds"], n_samples)
    pbw1, tbw1, sel1 = model.apply(
        params, tpts, frame, method=model.animation_from_canonical
    )

    bw_loss0 = masked_mean(smooth_l1(pbw0, tbw0), sel0)
    bw_loss1 = masked_mean(smooth_l1(pbw1, tbw1), sel1)
    loss = bw_loss0 + bw_loss1
    return loss, {"bw_loss0": bw_loss0, "bw_loss1": bw_loss1, "loss": loss}


from .trainer import Trainer


class AnimationTrainer(Trainer):
    """Drop-in stage-2 trainer: inherits train.trainer.Trainer's full
    step machinery — the vmapped step, the K-steps dispatch fusion,
    the frame store, AND the explicit-SPMD shard_map DP step (one frame
    per device, gradient pmean over 'dp') — by overriding `_loss_one`
    with the consistency loss. The optimizer is rebuilt in init_state:
    the novel_pose_bw trainable mask needs the param tree (the frozen
    base network mirrors aninerf_animation_trainer.py:27-31)."""

    def __init__(self, cfg, model, mesh=None):
        from .optim import make_optimizer

        super().__init__(cfg, model, mesh=mesh)
        self._tx_factory = make_optimizer
        self.n_anim = int(cfg.get("n_anim_samples", N_ANIM_SAMPLES))
        # the real tx is built in init_state once the trainable mask is
        # known; poison the base one so misuse fails loudly instead of
        # training with an unmasked optimizer (the jitted step fns read
        # self.tx at first trace, after init_state has replaced it)
        self.tx = None
        self.sched = None

    def init_state(self, key, sample_batch):
        from .trainer import TrainState

        fb = jax.tree_util.tree_map(lambda x: jnp.asarray(x[0]), sample_batch)
        rays_d = jnp.ones((8, 3))
        z = jnp.ones((8, self.cfg.N_samples))
        wpts = jnp.zeros((*z.shape, 3))
        params = jax.jit(
            lambda: self.model.init(
                key, wpts, rays_d, z, fb, train=True, novel_pose=True
            )
        )()
        mask = novel_pose_trainable_mask(params)
        self.tx, self.sched = self._tx_factory(self.cfg, trainable_mask=mask)
        opt_state = self.tx.init(params)
        return TrainState(params, opt_state, jnp.asarray(0))

    def _loss_one(self, params, fb, key, step):
        """Per-frame stage-2 consistency loss (replaces the rendering
        loss; consumed by the inherited vmapped AND shard_map steps)."""
        del step
        return animation_loss(
            self.model, params, fb, key, n_samples=self.n_anim
        )
