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
        # K train steps fused into one dispatch via lax.scan — amortizes
        # the fixed per-call dispatch cost (the reference pays one CUDA
        # launch cascade per iter, trainer.py:50-71; through the remote
        # TPU tunnel one dispatch costs ~26 ms, so K=16 is ~16x fewer
        # round-trips)
        self.steps_per_dispatch = int(
            cfg.train.get("steps_per_dispatch", 1) or 1
        )
        self._multi_step_fn = jax.jit(self._train_steps)

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

    def _train_steps(self, state: TrainState, batches, key):
        """K sequential train steps as ONE XLA program. `batches` leaves
        are shaped (K, B, ...); returns final state + stats stacked (K,)."""
        n_steps = batches["ray_o"].shape[0]
        keys = jax.random.split(key, n_steps)

        def body(st, xs):
            b, k = xs
            return self._train_step(st, b, k)

        return jax.lax.scan(body, state, (batches, keys))

    def train_steps(self, state, batches, key):
        return self._multi_step_fn(state, batches, key)

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
        step_batches = []
        k_steps = max(self.steps_per_dispatch, 1)
        # batch size = the mesh's dp axis (NOT the host device count —
        # the mesh may span fewer devices)
        batch_frames = mesh.shape["dp"] if mesh is not None else 1

        def log_stats(state, stats_host, n_inner, batch_time, data_time):
            """Per-inner-step recorder updates for one dispatch of
            n_inner steps (stats_host leaves shaped (n_inner,) or ())."""
            per_step = batch_time / n_inner
            for i in range(n_inner):
                recorder.step += 1
                recorder.batch_time.update(per_step)
                recorder.data_time.update(data_time / n_inner)
                s = {
                    k: float(v[i] if np.ndim(v) else v)
                    for k, v in stats_host.items()
                }
                # first-class throughput counter (SURVEY.md §5 tracing)
                s["rays_per_sec"] = (
                    batch_frames * n_rays / max(per_step, 1e-9)
                )
                recorder.update_stats(s)
                if recorder.step % log_interval == 0:
                    lr = float(self.sched(int(state.step)))
                    print(recorder.log_line(max_iter, lr))
                if recorder.step % record_interval == 0:
                    recorder.record("train")

        def run_step(state, key, batch, end):
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batch = shard_batch(batch, mesh)
            data_time = time.time() - end
            key, sub = jax.random.split(key)
            state, stats = self.train_step(state, batch, sub)
            jax.block_until_ready(stats["loss"])
            batch_time = time.time() - end
            log_stats(state, {k: float(v) for k, v in stats.items()}, 1,
                      batch_time, data_time)
            return state, key

        def run_multi(state, key, step_batches, end):
            batches = {
                k: np.stack([sb[k] for sb in step_batches])
                for k in step_batches[0]
            }
            if mesh is not None:
                from ..parallel.mesh import shard_batch

                batches = shard_batch(batches, mesh, leading_steps=True)
            data_time = time.time() - end
            key, sub = jax.random.split(key)
            state, stats = self.train_steps(state, batches, sub)
            jax.block_until_ready(stats["loss"])
            batch_time = time.time() - end
            log_stats(state, {k: np.asarray(v) for k, v in stats.items()},
                      len(step_batches), batch_time, data_time)
            return state, key

        for item in loader:
            items.append(collate_rays(item, n_rays))
            if len(items) < batch_frames:
                continue
            step_batches.append(stack_batch(items))
            items = []
            if len(step_batches) < k_steps:
                continue
            if k_steps == 1:
                state, key = run_step(state, key, step_batches[0], end)
            else:
                state, key = run_multi(state, key, step_batches, end)
            step_batches = []
            end = time.time()
        if items:
            # tail batch smaller than the mesh: pad by repeating items so
            # no training data is silently dropped
            while len(items) < batch_frames:
                items.append(items[-1])
            step_batches.append(stack_batch(items))
        # tail dispatches smaller than k_steps run one step at a time
        # (avoids compiling a second scan length)
        for sb in step_batches:
            state, key = run_step(state, key, sb, end)
            end = time.time()
        return state, key
