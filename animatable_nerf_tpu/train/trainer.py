"""The training engine: a single jitted SPMD train step + the epoch loop.

Reference counterpart: lib/train/trainers/trainer.py (device placement,
DDP wrap, per-iter forward/backward/clip/step, rank-0 logging) and
lib/train/trainers/tpose_trainer.py (loss assembly). Here the entire
iteration — stratified sampling, warp, field eval, compositing, losses,
gradients, clipping, Adam — is ONE XLA program; the frame axis shards
over the device mesh for data parallelism (see parallel/mesh.py).
"""

from __future__ import annotations

import time
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..render.renderer import RenderSettings, render_rays
from .losses import compute_losses
from .optim import make_optimizer

RAY_KEYS = ("ray_o", "ray_d", "near", "far", "mask", "occupancy", "rgb",
            "mask_at_box")
# per-frame metadata the models consume
FRAME_KEYS = (
    "R", "Th", "A", "big_A", "poses", "weights", "pvertices", "tvertices",
    "pbw", "tbw", "pbounds", "tbounds", "wbounds", "latent_index",
    "bw_latent_index",
)


class TrainState(NamedTuple):
    params: Any
    opt_state: Any
    step: jnp.ndarray


def collate_rays(item: dict, n_rays: int):
    """Trim/pad one dataset item's ray arrays to exactly n_rays (static
    shapes; the reference's sampler can overshoot N_rand and the eval
    path is variable-length — both become mask-padded here)."""
    out = {}
    n = len(item["ray_o"])
    for k in RAY_KEYS:
        if k not in item:
            continue
        v = np.asarray(item[k])
        if len(v) >= n_rays:
            v = v[:n_rays]
        else:
            widths = [(0, n_rays - len(v))] + [(0, 0)] * (v.ndim - 1)
            v = np.pad(v, widths)
        out[k] = v
    mask = np.zeros(n_rays, dtype=bool)
    mask[: min(n, n_rays)] = True
    if "mask_at_box" in out:
        out["mask_at_box"] = out["mask_at_box"].astype(bool) & mask
    out["mask"] = mask
    for k in FRAME_KEYS:
        if k in item:
            out[k] = np.asarray(item[k])
    if "occupancy" in out:
        out["occupancy"] = out["occupancy"].astype(np.int32)
    for k in ("latent_index", "bw_latent_index"):
        if k in out:
            out[k] = np.asarray(out[k], np.int32)
    return out


def stack_batch(items):
    """Stack collated items along a leading frame axis."""
    keys = items[0].keys()
    return {k: np.stack([it[k] for it in items]) for k in keys}


class Trainer:
    """Builds and runs the jitted train step for a model family."""

    def __init__(self, cfg, model, novel_pose: bool = False,
                 trainable_mask=None):
        self.cfg = cfg
        self.model = model
        self.novel_pose = novel_pose
        self.settings = RenderSettings(
            n_samples=cfg.N_samples,
            perturb=cfg.perturb > 0,
            white_bkgd=cfg.white_bkgd,
            eval_tile=cfg.get("eval_tile", 8192),
        )
        self.tx, self.sched = make_optimizer(cfg, trainable_mask)
        self._step_fn = jax.jit(self._train_step)

    # ------------------------------------------------------------- init
    def init_state(self, key, sample_batch) -> TrainState:
        """Initialize params from one collated batch (leading frame axis)."""
        fb = jax.tree_util.tree_map(lambda x: jnp.asarray(x[0]), sample_batch)
        rays = {k: fb[k] for k in RAY_KEYS if k in fb}
        z = jnp.ones((rays["ray_o"].shape[0], self.settings.n_samples))
        wpts = jnp.zeros((*z.shape, 3))
        kwargs = {"novel_pose": True} if self.novel_pose else {}
        params = jax.jit(
            lambda: self.model.init(
                key, wpts, rays["ray_d"], z, fb, train=True, **kwargs
            )
        )()
        opt_state = self.tx.init(params)
        return TrainState(params, opt_state, jnp.asarray(0))

    # ------------------------------------------------------------- step
    def _loss_one(self, params, fb, key, step):
        rays = {k: fb[k] for k in RAY_KEYS if k in fb}
        ret = render_rays(
            self.model,
            params,
            rays,
            fb,
            self.settings,
            key=key,
            train=True,
            novel_pose=self.novel_pose,
        )
        return compute_losses(ret, rays, step)

    def _train_step(self, state: TrainState, batch, key):
        def loss_fn(params):
            B = batch["ray_o"].shape[0]
            keys = jax.random.split(key, B)
            losses, stats = jax.vmap(
                lambda fb, k: self._loss_one(params, fb, k, state.step),
                in_axes=(0, 0),
            )(batch, keys)
            # mean over the (possibly device-sharded) frame axis: XLA
            # emits the cross-device gradient reduction here
            return jnp.mean(losses), jax.tree_util.tree_map(jnp.mean, stats)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        # step counts CONSUMED FRAMES, not optimizer updates: the
        # reference trains one frame per iteration, so under data
        # parallelism (B frames per update) advancing by B keeps the LR
        # schedule and loss schedules (sdf alpha milestones) on the
        # reference timeline
        n_frames = batch["ray_o"].shape[0]
        return TrainState(params, opt_state, state.step + n_frames), stats

    def train_step(self, state, batch, key):
        return self._step_fn(state, batch, key)

    # ------------------------------------------------------------- loop
    def train_epoch(self, state, loader, recorder, key, epoch: int,
                    max_iter: int, mesh=None, log_interval: int = 20,
                    record_interval: int = 20):
        """One epoch over the loader (trainer.py:50-102 semantics)."""
        loader.set_epoch(epoch)
        recorder.epoch = epoch
        n_rays = self.cfg.N_rand
        end = time.time()
        items = []
        # batch size = the mesh's dp axis (NOT the host device count —
        # the mesh may span fewer devices)
        batch_frames = mesh.shape["dp"] if mesh is not None else 1

        def run_step(state, key, items, end):
            batch = stack_batch(items)
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(batch, mesh)
            data_time = time.time() - end
            key, sub = jax.random.split(key)
            state, stats = self.train_step(state, batch, sub)
            jax.block_until_ready(stats["loss"])
            batch_time = time.time() - end

            recorder.step += 1
            recorder.batch_time.update(batch_time)
            recorder.data_time.update(data_time)
            stats = {k: float(v) for k, v in stats.items()}
            # first-class throughput counter (SURVEY.md §5 tracing)
            stats["rays_per_sec"] = (
                len(items) * n_rays / max(batch_time, 1e-9)
            )
            recorder.update_stats(stats)
            if recorder.step % log_interval == 0:
                lr = float(self.sched(int(state.step)))
                print(recorder.log_line(max_iter, lr))
            if recorder.step % record_interval == 0:
                recorder.record("train")
            return state, key

        for item in loader:
            items.append(collate_rays(item, n_rays))
            if len(items) < batch_frames:
                continue
            state, key = run_step(state, key, items, end)
            items = []
            end = time.time()
        if items:
            # tail batch smaller than the mesh: pad by repeating items so
            # no training data is silently dropped
            while len(items) < batch_frames:
                items.append(items[-1])
            state, key = run_step(state, key, items, end)
        return state, key
