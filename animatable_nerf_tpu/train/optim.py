"""Optimizers and LR schedules.

Reference: lib/train/optimizer.py (Adam/RAdam/SGD factory, gradient value
clip 40 in trainer.py:67) and lib/utils/optimizer/lr_scheduler.py
(ExponentialLR gamma^(epoch/decay_epochs), MultiStepLR).
"""

from __future__ import annotations

import optax


def exponential_lr(base_lr: float, gamma: float, decay_epochs: int, ep_iter: int):
    """lr(step) = base_lr * gamma^(epoch / decay_epochs), epoch stepped
    per ep_iter iterations (lr_scheduler.py:66-77 applied per epoch)."""

    def sched(step):
        epoch = step // ep_iter
        return base_lr * gamma ** (epoch / decay_epochs)

    return sched


def make_multi_step_lr(base_lr: float, milestones, gamma: float, ep_iter: int):
    """MultiStepLR (lr_scheduler.py:52-63)."""

    def sched(step):
        epoch = step // ep_iter
        lr = base_lr
        factor = 1.0
        for m in sorted(milestones):
            factor = factor * (gamma ** (epoch >= m))
        return lr * factor

    return sched


def make_schedule(cfg):
    s = cfg.train.scheduler
    ep_iter = max(cfg.ep_iter, 1)
    if s["type"] == "exponential":
        return exponential_lr(cfg.train.lr, s["gamma"], s["decay_epochs"], ep_iter)
    base = make_multi_step_lr(
        cfg.train.lr, s["milestones"], s["gamma"], ep_iter
    )
    if s["type"] == "warmup_multi_step":
        # linear warmup over warmup_iters then the multi-step decay
        # (lib/utils/optimizer/lr_scheduler.py:7-49)
        warmup_iters = int(s.get("warmup_iters", 500))
        warmup_factor = float(s.get("warmup_factor", 1.0 / 3))

        def sched(step):
            import jax.numpy as jnp

            frac = jnp.clip(step / max(warmup_iters, 1), 0.0, 1.0)
            w = warmup_factor * (1 - frac) + frac
            return base(step) * jnp.where(step < warmup_iters, w, 1.0)

        return sched
    return base


def make_optimizer(cfg, trainable_mask=None):
    """optax chain: value-clip 40 -> adam with the config schedule.

    trainable_mask: optional pytree of bools (stage-2 freezes everything
    but novel_pose_bw — aninerf_animation_trainer.py:27-31).
    """
    sched = make_schedule(cfg)
    opt_name = cfg.train.get("optim", "adam")
    wd = cfg.train.get("weight_decay", 0.0)
    if opt_name == "radam":
        # the reference vendors RAdam (lib/utils/optimizer/radam.py)
        base = optax.radam(learning_rate=sched)
    elif opt_name == "adam":
        if wd > 0:
            base = optax.adamw(learning_rate=sched, weight_decay=wd)
        else:
            base = optax.adam(learning_rate=sched)
    else:
        base = optax.sgd(learning_rate=sched, momentum=0.9)
    tx = optax.chain(optax.clip(40.0), base)
    if trainable_mask is not None:
        # NOT optax.masked(tx, mask): masked passes the RAW gradient
        # through for mask=False leaves (it only skips the transform),
        # which would apply unscaled gradient ascent to "frozen" params.
        # multi_transform + set_to_zero makes frozen updates exactly 0.
        import jax

        labels = jax.tree_util.tree_map(
            lambda m: "train" if m else "freeze", trainable_mask
        )
        tx = optax.multi_transform(
            {"train": tx, "freeze": optax.set_to_zero()}, labels
        )
    return tx, sched
