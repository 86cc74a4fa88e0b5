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


class PreemptionGuard:
    """SIGTERM/SIGINT-safe training.

    The reference has no preemption handling (SURVEY §5: recovery is
    resumable checkpoints only; a killed run loses everything since the
    last save_latest_ep epoch). Production TPU pools send SIGTERM
    before reclaiming a slice — this guard converts the first signal
    into a cooperative stop: train_epoch checks `should_stop` between
    dispatches, run_train saves a resumable `latest` checkpoint and
    returns cleanly. The original handlers are restored after the
    first signal, so a second SIGINT/SIGTERM still kills the process
    the default way.
    """

    def __init__(self, signums=None):
        import signal as _signal

        self._signal = _signal
        self.should_stop = False
        self._prev = {}
        if signums is None:
            signums = (_signal.SIGTERM, _signal.SIGINT)
        try:
            for s in signums:
                self._prev[s] = _signal.signal(s, self._handle)
        except ValueError:  # not the main thread: run unguarded
            self._prev = {}

    def _handle(self, signum, frame):
        self.should_stop = True
        self.restore()  # second signal falls through to the default
        # os.write, NOT print: the handler can fire inside a buffered
        # stdout write (the training log line), where print() raises a
        # reentrant-IO RuntimeError in the main thread and would kill
        # the run before the checkpoint this guard exists to save
        import os as _os

        _os.write(
            2,
            (
                f"[train] received signal {signum}: saving a resumable "
                "checkpoint at the next step boundary, then exiting\n"
            ).encode(),
        )

    def restore(self):
        for s, h in self._prev.items():
            self._signal.signal(s, h)
        self._prev = {}


def collate_rays(item: dict, n_rays: int, frame_slot: int | None = None):
    """Trim/pad one dataset item's ray arrays to exactly n_rays (static
    shapes; the reference's sampler can overshoot N_rand and the eval
    path is variable-length — both become mask-padded here).

    frame_slot=None embeds the full per-frame metadata (FRAME_KEYS) in
    the item; with a slot id, only the slot + latent indices ride along
    and the heavy arrays come from a device-resident FrameStore."""
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
    if frame_slot is None:
        for k in FRAME_KEYS:
            if k in item:
                out[k] = np.asarray(item[k])
    else:
        out["frame_slot"] = np.asarray(frame_slot, np.int32)
        for k in ("latent_index", "bw_latent_index"):
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


# frame metadata held on-device (everything per-frame except the latent
# indices, which vary per item under test_novel_pose overrides)
FRAME_STORE_KEYS = tuple(
    k for k in FRAME_KEYS if k not in ("latent_index", "bw_latent_index")
)


def build_frame_store(ds, mesh=None, max_mb: float = 4096.0,
                      pdist_res: int = 0):
    """Upload all per-frame metadata (blend-weight grids, transforms,
    vertices, bounds) to the device ONCE; training steps then gather by
    frame slot instead of re-uploading ~tens of MB per step.

    pdist_res > 0 (KNN-family models): also bake a per-frame packed
    nearest-vertex distance grid (ops/knn_pallas.py build_pdist_payload)
    into the store — the train-time survivor compaction then runs its
    pass 1 as a conservative grid trilerp instead of a full KNN sweep
    over every sampled point (models/pdf.py _train_compacted). Counted
    against max_mb like every other key.

    Why: the reference streams the full batch host->GPU every iteration
    (trainer.py:27-40 `to_cuda`); over PCIe that is cheap, but the
    per-frame bw volumes dominate the batch (pbw+tbw were 18.7 of
    18.7 MB measured) and make the TPU train step H2D-bound. The frame
    set is small and static — classic device-resident lookup table.

    Keys whose value is identical across frames (tbw, tvertices,
    weights, big_A, tbounds, ...) are stored once; varying keys are
    stacked (F, ...) and gathered by slot inside the jitted step.

    Returns {"per_frame", "static", "slot_of"} or None if the stacked
    store would exceed max_mb (fall back to per-step upload)."""
    num_cams = max(int(getattr(ds, "num_cams", 1)), 1)
    n_frames = max(len(ds) // num_cams, 1)
    payloads = []
    slot_of = {}
    # prefer the dataset's light metadata accessor (no image decode, no
    # ray sampling); the full-item fallback must not perturb the
    # ray-sampling RNG (fix_random reproducibility)
    meta_fn = getattr(ds, "frame_meta", None)
    rng = getattr(ds, "_rng", None) if meta_fn is None else None
    rng_state = rng.get_state() if rng is not None else None
    for f in range(n_frames):
        item = meta_fn(f * num_cams) if meta_fn else ds[f * num_cams]
        slot_of[int(item["frame_index"])] = f
        payloads.append(
            {k: np.asarray(item[k]) for k in FRAME_STORE_KEYS if k in item}
        )
    if rng_state is not None:
        rng.set_state(rng_state)
    if pdist_res > 1 and payloads and "pvertices" in payloads[0]:
        import functools

        from ..ops.knn_pallas import build_pdist_payload

        build = jax.jit(functools.partial(build_pdist_payload, res=pdist_res))
        for p in payloads:
            packed, margin, bnds = build(jnp.asarray(p["pvertices"]))
            p["pdist_packed"] = np.asarray(packed)
            p["pdist_margin"] = np.asarray(margin)
            p["pdist_bounds"] = np.asarray(bnds)
    static, per_frame = {}, {}
    for k in payloads[0]:
        vals = [p[k] for p in payloads]
        if all(np.array_equal(vals[0], v) for v in vals[1:]):
            static[k] = vals[0]
        else:
            per_frame[k] = np.stack(vals)
    total_mb = (
        sum(v.nbytes for v in static.values())
        + sum(v.nbytes for v in per_frame.values())
    ) / 1e6
    if total_mb > max_mb:
        print(
            f"frame store {total_mb:.0f} MB over budget {max_mb:.0f} MB — "
            "falling back to per-step upload"
        )
        return None
    if mesh is not None:
        from jax.sharding import NamedSharding, PartitionSpec as P

        sh = NamedSharding(mesh, P())  # replicated
        put = lambda v: jax.device_put(v, sh)  # noqa: E731
    else:
        put = jax.device_put
    return {
        "per_frame": {k: put(v) for k, v in per_frame.items()},
        "static": {k: put(v) for k, v in static.items()},
        "slot_of": slot_of,
    }


def _store_args(store):
    """Arrays-only view of a FrameStore for passing into jit (slot_of is
    host-side bookkeeping, not a pytree of arrays)."""
    if store is None:
        return None
    return {"per_frame": store["per_frame"], "static": store["static"]}


def assemble_from_store(batch, store):
    """Merge a rays-only batch (leading frame axis B) with the device
    store: per-frame keys gathered by slot, static keys broadcast."""
    if store is None:
        return batch
    fb = dict(batch)
    slots = fb.pop("frame_slot")
    B = slots.shape[0]
    for k, a in store["per_frame"].items():
        fb[k] = a[slots]
    for k, a in store["static"].items():
        fb[k] = jnp.broadcast_to(a, (B,) + a.shape)
    return fb


class Trainer:
    """Builds and runs the jitted train step for a model family."""

    def __init__(self, cfg, model, novel_pose: bool = False,
                 trainable_mask=None, mesh=None):
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
        # stats come back as ONE packed (n_stats, K) array fetched in a
        # single host transfer: the remote relay charges ~25 ms PER
        # LEAF on device->host reads (measured: 8-leaf stats dict
        # 201 ms vs packed 25.6 ms per dispatch), so the per-dispatch
        # logging fetch was costing ~12 ms/step at K=16. The key order
        # is recorded at trace time (_stats_keys); chip-local hosts
        # simply see one copy instead of eight.
        self._stats_keys = None
        self._multi_step_fn_packed = jax.jit(self._pack_stats_out(
            self._train_steps
        ))
        # explicit-SPMD DP step (shard_map): each device runs the CLEAN
        # single-frame graph on its own frame and the gradient pmean
        # rides ICI — replacing the reference's NCCL DDP all-reduce
        # (trainer.py:14-18). Preferred over the vmapped auto-sharded
        # step on a mesh: the per-device program is the same unbatched
        # graph as B==1 (no vmapped scatter/gather in the compacted
        # paths), and the collective placement is explicit.
        self.mesh = mesh
        self._sharded_step_fn = None
        self._sharded_multi_fn = None
        self._sharded_multi_fn_packed = None
        if mesh is not None and mesh.shape.get("dp", 1) > 1:
            self._sharded_step_fn = jax.jit(self._train_step_sharded)
            self._sharded_multi_fn = jax.jit(self._train_steps_sharded)
            self._sharded_multi_fn_packed = jax.jit(self._pack_stats_out(
                self._train_steps_sharded
            ))

    def _pack_stats_out(self, fn):
        """Wrap a (…) -> (state, stats_dict) step fn so the jitted
        program returns (state, jnp.stack(sorted stats)) — one D2H leaf
        instead of one per stat. Sorted key order is captured at trace
        time into self._stats_keys (tracing completes before the first
        result is consumed)."""

        def wrapped(*args, **kwargs):
            state, stats = fn(*args, **kwargs)
            keys = tuple(sorted(stats))
            self._stats_keys = keys
            packed = jnp.stack(
                [jnp.asarray(stats[k], jnp.float32) for k in keys]
            )
            return state, packed

        return wrapped

    def disable_train_stage2(self):
        """Rebuild the jitted steps with stage-2 train compaction off
        (stage2_ratio=0): the next dispatch runs the widened pass-1
        stream, which is exact at ~1.3x the exact capacity. Idempotent;
        one recompile. Called by train_epoch when the stage-2 overflow
        stat fires (models/pdf.py _train_stage2)."""
        if getattr(self.model, "stage2_ratio", 0) <= 0:
            return
        self.model = self.model.clone(stage2_ratio=0.0)
        self._step_fn = jax.jit(self._train_step)
        self._multi_step_fn = jax.jit(self._train_steps)
        self._multi_step_fn_packed = jax.jit(self._pack_stats_out(
            self._train_steps
        ))
        if self._sharded_step_fn is not None:
            self._sharded_step_fn = jax.jit(self._train_step_sharded)
            self._sharded_multi_fn = jax.jit(self._train_steps_sharded)
            self._sharded_multi_fn_packed = jax.jit(self._pack_stats_out(
                self._train_steps_sharded
            ))

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
        return compute_losses(
            ret, rays, step,
            mask_alpha_max=float(self.cfg.get("sdf_mask_alpha_max", 0.0)),
        )

    def _train_step(self, state: TrainState, batch, key, store=None):
        full = assemble_from_store(batch, store)

        def loss_fn(params):
            B = full["ray_o"].shape[0]
            keys = jax.random.split(key, B)
            if B == 1:
                # bypass vmap for the reference's batch_size-1 regime:
                # batching the compacted SDF train graph (data-dependent
                # gather/scatter under double-backward) makes XLA emit a
                # ~16x slower program on TPU (measured 135 -> 2128 ms);
                # the unbatched graph compiles clean. Same math: mean
                # over one frame == the frame.
                fb1 = jax.tree_util.tree_map(lambda x: x[0], full)
                loss, stats = self._loss_one(params, fb1, keys[0], state.step)
                return loss, stats
            losses, stats = jax.vmap(
                lambda fb, k: self._loss_one(params, fb, k, state.step),
                in_axes=(0, 0),
            )(full, keys)
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

    # ------------------------------------------------- shard_map DP step
    def _shard_specs(self, batch, store_args):
        from jax.sharding import PartitionSpec as P

        dp = P("dp")
        rep = P()
        batch_specs = jax.tree_util.tree_map(lambda _: dp, batch)
        store_specs = jax.tree_util.tree_map(lambda _: rep, store_args)
        return batch_specs, store_specs, dp, rep

    def _local_update(self, state, lbatch, lkeys, lstore):
        """Per-device body: one local frame's loss/grad, dp-pmean'd
        gradients, replicated optimizer update."""
        full = assemble_from_store(lbatch, lstore)

        def loss_fn(params):
            fb1 = jax.tree_util.tree_map(lambda x: x[0], full)
            return self._loss_one(params, fb1, lkeys[0], state.step)

        (loss, stats), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params
        )
        grads = jax.lax.pmean(grads, "dp")
        loss = jax.lax.pmean(loss, "dp")
        stats = jax.tree_util.tree_map(
            lambda s: jax.lax.pmean(s, "dp"), stats
        )
        updates, opt_state = self.tx.update(grads, state.opt_state, state.params)
        params = jax.tree_util.tree_map(
            lambda p, u: p + u, state.params, updates
        )
        n_frames = jax.lax.psum(lbatch["ray_o"].shape[0], "dp")
        return TrainState(params, opt_state, state.step + n_frames), stats

    def _train_step_sharded(self, state, batch, keys, store=None):
        """Explicit-SPMD DP train step over self.mesh: batch/keys frame
        axis sharded on 'dp' (one frame per device), params/opt/store
        replicated. Matches the vmapped step's math exactly (same
        per-frame keys, mean loss/grad over frames)."""
        from ..parallel.eval_sharding import _shard_map as shard_map

        batch_specs, store_specs, dp, rep = self._shard_specs(batch, store)

        def body(state, lbatch, lkeys, lstore):
            return self._local_update(state, lbatch, lkeys, lstore)

        return shard_map(
            body, mesh=self.mesh,
            in_specs=(rep, batch_specs, dp, store_specs),
            out_specs=(rep, rep),
        )(state, batch, keys, store)

    def _train_steps_sharded(self, state, batches, keys, store=None):
        """K sharded steps in one dispatch: leaves (K, B, ...), keys
        (K, B); scan over K inside shard_map."""
        from ..parallel.eval_sharding import _shard_map as shard_map
        from jax.sharding import PartitionSpec as P

        _, store_specs, _, rep = self._shard_specs(batches, store)
        batch_specs = jax.tree_util.tree_map(
            lambda _: P(None, "dp"), batches
        )

        def body(state, lbatches, lkeys, lstore):
            def step(st, xs):
                lb, lk = xs
                return self._local_update(st, lb, lk, lstore)

            return jax.lax.scan(step, state, (lbatches, lkeys))

        return shard_map(
            body, mesh=self.mesh,
            in_specs=(rep, batch_specs, P(None, "dp"), store_specs),
            out_specs=(rep, rep),
        )(state, batches, keys, store)

    def _use_sharded(self, n_frames: int) -> bool:
        return (
            self._sharded_step_fn is not None
            and n_frames == self.mesh.shape["dp"]
            and n_frames > 1
        )

    def train_step(self, state, batch, key, store=None):
        B = batch["ray_o"].shape[0]
        if self._use_sharded(B):
            keys = jax.random.split(key, B)
            return self._sharded_step_fn(
                state, batch, keys, _store_args(store)
            )
        return self._step_fn(state, batch, key, _store_args(store))

    def _train_steps(self, state: TrainState, batches, key, store=None):
        """K sequential train steps as ONE XLA program. `batches` leaves
        are shaped (K, B, ...); returns final state + stats stacked (K,)."""
        n_steps = batches["ray_o"].shape[0]
        keys = jax.random.split(key, n_steps)

        def body(st, xs):
            b, k = xs
            return self._train_step(st, b, k, store)

        return jax.lax.scan(body, state, (batches, keys))

    def train_steps(self, state, batches, key, store=None):
        K, B = batches["ray_o"].shape[:2]
        if self._use_sharded(B):
            keys = jax.vmap(
                lambda k: jax.random.split(k, B)
            )(jax.random.split(key, K))
            return self._sharded_multi_fn(
                state, batches, keys, _store_args(store)
            )
        return self._multi_step_fn(state, batches, key, _store_args(store))

    def train_steps_packed(self, state, batches, key, store=None):
        """train_steps with the stats packed into one (n_stats, K) f32
        array (single D2H transfer; see _pack_stats_out). Returns
        (state, stats_dict_of_host_numpy) — the fetch happens here."""
        K, B = batches["ray_o"].shape[:2]
        if self._use_sharded(B):
            keys = jax.vmap(
                lambda k: jax.random.split(k, B)
            )(jax.random.split(key, K))
            state, packed = self._sharded_multi_fn_packed(
                state, batches, keys, _store_args(store)
            )
        else:
            state, packed = self._multi_step_fn_packed(
                state, batches, key, _store_args(store)
            )
        arr = np.asarray(packed)
        return state, {k: arr[i] for i, k in enumerate(self._stats_keys)}

    # ------------------------------------------------------------- loop
    def train_epoch(self, state, loader, recorder, key, epoch: int,
                    max_iter: int, mesh=None, log_interval: int = 20,
                    record_interval: int = 20, store=None, guard=None):
        """One epoch over the loader (trainer.py:50-102 semantics).

        `guard` (PreemptionGuard): when its should_stop flips, the loop
        exits at the next dispatch boundary (pending partial batches are
        dropped — the caller checkpoints and the resumed run replays
        them)."""
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

        warned_overflow = [False]

        def log_stats(state, stats_host, n_inner, batch_time, data_time):
            """Per-inner-step recorder updates for one dispatch of
            n_inner steps (stats_host leaves shaped (n_inner,) or ())."""
            # survivor-compaction overflow DROPS in-shell points and the
            # step trains on wrong gradients (measured: an always-
            # overflowing run plateaus at 270x the converged loss,
            # BASELINE.md) — make it loud, once per epoch
            ovf = stats_host.get("compact_overflow")
            ovf2 = stats_host.get("compact_overflow_stage2")
            if (ovf2 is not None and float(np.max(ovf2)) > 0
                    and getattr(self.model, "stage2_ratio", 0) > 0):
                # stage-2-only overflow: the exact survivors exceed the
                # exact train_keep_frac capacity but (absent a pass-1
                # flag) fit the 1.3x-widened pass-1 stream the pre-
                # stage-2 path trained exactly on. Fall back to that
                # path for the rest of the run instead of training on
                # biased gradients (ADVICE r3) — one recompile.
                print(
                    "[train] stage-2 train compaction overflowed "
                    "(exact survivors > train_keep_frac capacity); "
                    "disabling train stage-2 and falling back to the "
                    "widened pass-1 stream (exact, ~1.3x capacity)."
                )
                self.disable_train_stage2()
            elif (ovf is not None and not warned_overflow[0]
                    and float(np.max(ovf)) > 0):
                warned_overflow[0] = True
                print(
                    "[train] WARNING: train-time survivor compaction "
                    "overflowed — survivors were dropped and gradients "
                    "are biased. Raise train_keep_frac (capacity) or "
                    "lower norm_th for this scene."
                )
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
            state, stats = self.train_step(state, batch, sub, store=store)
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
            # packed-stats path: the single np.asarray inside forces
            # full completion (block_until_ready can return early for
            # programs containing Pallas calls — CLAUDE.md), so
            # batch_time here is the honest wall cost of the dispatch
            state, stats_host = self.train_steps_packed(
                state, batches, sub, store=store
            )
            batch_time = time.time() - end
            log_stats(state, stats_host, len(step_batches), batch_time,
                      data_time)
            return state, key

        def collate(item):
            slot = (store["slot_of"][int(item["frame_index"])]
                    if store is not None else None)
            return collate_rays(item, n_rays, frame_slot=slot)

        for item in loader:
            if guard is not None and guard.should_stop:
                return state, key
            items.append(collate(item))
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
