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
    """Drop-in stage-2 trainer: same TrainState/step/epoch interface as
    train.trainer.Trainer (train_epoch with its dispatch-fusion and
    frame-store machinery is inherited) but with the consistency loss
    and the frozen base network. The optimizer is rebuilt in init_state —
    the novel_pose_bw trainable mask needs the param tree. Under a mesh
    the vmapped DP path batches `dp` frames per optimizer update with a
    mean gradient, the same DDP semantics as stage 1 (the reference
    trains stage 2 single-GPU, one frame per update)."""

    def __init__(self, cfg, model, mesh=None):
        from .optim import make_optimizer

        super().__init__(cfg, model, mesh=None)  # stage-2 has no
        # shard_map step of its own; mesh DP runs through the vmapped
        # loss (see class docstring)
        del mesh
        self._tx_factory = make_optimizer
        # the real tx/step fns are built in init_state once the
        # trainable mask is known; poison the base ones so misuse fails
        # loudly instead of training with an unmasked optimizer
        self.tx = None
        self.sched = None
        self._step_fn = None
        self._multi_step_fn = None

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
        self._build_step()
        return TrainState(params, opt_state, jnp.asarray(0))

    def _build_step(self):
        from .trainer import TrainState

        n_anim = int(self.cfg.get("n_anim_samples", N_ANIM_SAMPLES))

        def step(state, batch, key, store=None):
            from .trainer import assemble_from_store

            full = assemble_from_store(batch, store)

            def loss_fn(params):
                B = full["wbounds"].shape[0]
                keys = jax.random.split(key, B)
                if B == 1:
                    # B==1 vmap bypass, as in Trainer._train_step
                    fb1 = jax.tree_util.tree_map(lambda x: x[0], full)
                    return animation_loss(
                        self.model, params, fb1, keys[0], n_samples=n_anim
                    )
                losses, stats = jax.vmap(
                    lambda fb, k: animation_loss(
                        self.model, params, fb, k, n_samples=n_anim
                    )
                )(full, keys)
                return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, stats)

            (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                state.params
            )
            updates, opt_state = self.tx.update(
                grads, state.opt_state, state.params
            )
            params = jax.tree_util.tree_map(lambda p, u: p + u, state.params, updates)
            n_frames = full["A"].shape[0]
            return TrainState(
                params, opt_state, state.step + n_frames
            ), stats

        self._step_fn = jax.jit(step)

        def steps(state, batches, key, store=None):
            n_steps = next(iter(batches.values())).shape[0]
            keys = jax.random.split(key, n_steps)
            return jax.lax.scan(
                lambda st, xs: step(st, xs[0], xs[1], store), state,
                (batches, keys),
            )

        self._multi_step_fn = jax.jit(steps)

    def train_step(self, state, batch, key, store=None):
        from .trainer import _store_args

        return self._step_fn(state, batch, key, _store_args(store))

    def train_steps(self, state, batches, key, store=None):
        """K stage-2 steps fused into one dispatch (leaves (K, B, ...))."""
        from .trainer import _store_args

        return self._multi_step_fn(state, batches, key, _store_args(store))
