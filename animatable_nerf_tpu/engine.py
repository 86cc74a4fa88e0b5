"""Engine: wires config -> dataset/model/trainer/evaluator/visualizer and
implements the run types of the reference CLI.

Reference counterparts: train_net.py (epoch loop, checkpoints, periodic
val), run.py (run_dataset / run_network / run_evaluate / run_visualize),
and the make_* factories (lib/*/make_*.py) — replaced by explicit
registries keyed by the same module names so reference yaml configs
resolve unchanged.
"""

from __future__ import annotations

import functools
import os
import time

import numpy as np
import jax
import jax.numpy as jnp

from .config import Config
from .models import make_model
from .models.registry import is_image_space
from .models.pdf import SDFPDF, NeuSPDF
from .data import (
    TPoseDataset,
    TPosePDFDataset,
    Loader,
    FrameSampler,
)
from .data.novel_view import (
    NovelViewDataset,
    NovelViewPDFDataset,
    PoseSequenceDataset,
    PoseSequencePDFDataset,
)
from .data.mesh_dataset import MeshDataset, SDFMeshDataset, PDFMeshDataset
from .render import (
    RenderSettings,
    render_image,
    pad_rays,
    prepare_inside_mask,
)
from .render.mesh import density_grid_sweep, marching_cubes, largest_component
from .train import (
    Trainer,
    Recorder,
    save_checkpoint,
    load_checkpoint,
    save_best_checkpoint,
)
from .train.trainer import collate_rays, stack_batch, RAY_KEYS, FRAME_KEYS
from .evaluators import ImageEvaluator, MeshEvaluator
from .visualizers import (
    NovelViewVisualizer,
    PoseSequenceVisualizer,
    MeshVisualizer,
)
from .core import sample_blend_closest_points
from .core.lbs import (
    pose_points_to_tpose_points,
    tpose_points_to_pose_points,
    pose_points_to_world_points,
)

DATASETS = {
    "lib.datasets.tpose_dataset": TPoseDataset,
    "lib.datasets.tpose_pdf_dataset": TPosePDFDataset,
    "lib.datasets.tpose_novel_view_dataset": NovelViewDataset,
    "lib.datasets.tpose_pdf_novel_view_dataset": NovelViewPDFDataset,
    "lib.datasets.tpose_pose_sequence_dataset": PoseSequenceDataset,
    "lib.datasets.tpose_pdf_pose_sequence_dataset": PoseSequencePDFDataset,
    "lib.datasets.aninerf_mesh_dataset": MeshDataset,
    "lib.datasets.anisdf_mesh_dataset": SDFMeshDataset,
    "lib.datasets.aninerf_pdf_mesh_dataset": PDFMeshDataset,
    "tpose": TPoseDataset,
    "tpose_pdf": TPosePDFDataset,
}


def _register_baseline_datasets():
    from .data.baselines import NHRDataset, NTDataset

    DATASETS.setdefault("lib.datasets.h36m.nhr", NHRDataset)
    DATASETS.setdefault("nhr", NHRDataset)
    DATASETS.setdefault("lib.datasets.h36m.nt", NTDataset)
    DATASETS.setdefault("nt", NTDataset)


def make_dataset(cfg: Config, split: str):
    name = cfg.train_dataset_module if split == "train" else cfg.test_dataset_module
    if name not in DATASETS:
        _register_baseline_datasets()
    return DATASETS[name](cfg, split)


def make_test_loader(cfg: Config, dataset):
    sampler = None
    if cfg.test.get("sampler") == "FrameSampler":
        sampler = FrameSampler(
            dataset,
            interval=cfg.test.frame_sampler_interval,
            begin=cfg.test.get("begin_sampler_ind", 0),
            count=cfg.test.get("num_sampler_ind", -1),
            # the reference's num_sampler_ind=-1 default caps the window
            # at num_train_frame (samplers.py:143)
            default_count=cfg.num_train_frame,
        )
    return Loader(dataset, shuffle=False, sampler=sampler, num_threads=2)


def render_settings(cfg: Config) -> RenderSettings:
    # N_importance is declared in the reference's configs but dead there
    # (sample_pdf never called); live hierarchical sampling is opt-in so
    # default behavior matches the reference protocol
    n_imp = int(cfg.N_importance) if cfg.get("use_importance", False) else 0
    return RenderSettings(
        n_samples=cfg.N_samples,
        perturb=cfg.perturb > 0,
        white_bkgd=cfg.white_bkgd,
        eval_tile=cfg.get("eval_tile", 8192),
        n_importance=n_imp,
        dense_chunk_rows=int(cfg.get("dense_chunk_rows", 131072)),
    )


def frame_arrays(item: dict):
    """Extract the jnp frame dict from a dataset item."""
    out = {}
    for k in FRAME_KEYS:
        if k in item:
            out[k] = jnp.asarray(item[k])
    for k in ("latent_index", "bw_latent_index"):
        if k in out:
            out[k] = jnp.asarray(np.asarray(item[k]), jnp.int32)
    return out


def _bucket_pad(n: int, tile: int) -> int:
    """Pad ray counts to tile * next power-of-two tile-count so eval
    shapes form a tiny set of compiled programs."""
    tiles = max(1, int(np.ceil(n / tile)))
    return tile * (1 << (tiles - 1).bit_length())


# what the renderer consumes per ray; notably NOT mask_at_box (that is
# the full-image H*W bool array, a different length than the ray arrays)
# and NOT rgb (loss-only)
_EVAL_RAY_KEYS = ("ray_o", "ray_d", "near", "far", "mask", "occupancy")


def eval_rays(item: dict, tile: int):
    """Pad an eval item's rays into jit-stable shapes."""
    rays = {k: np.asarray(item[k]) for k in _EVAL_RAY_KEYS if k in item}
    if "occupancy" in rays:
        rays["occupancy"] = rays["occupancy"].astype(np.int32)
    n = len(rays["ray_o"])
    target = _bucket_pad(n, tile)
    padded, n_valid = pad_rays(rays, target)
    # pad_rays pads to a multiple; extend to the bucket target exactly
    return {k: jnp.asarray(v) for k, v in padded.items()}, n_valid


def interleave_rays(rays: dict, tile: int):
    """Stride-permute padded rays so every eval tile samples uniformly
    across the image.

    Eval rays arrive in scanline order, so consecutive tiles alternate
    between dense body regions and empty background — and the survivor
    compaction capacity must fit the WORST tile. Tile k instead gets
    rays k, k+T, k+2T, ... (T = number of tiles), which equalizes
    per-tile survivor counts to ~the global fraction and lets the
    adaptive capacity ladder (Engine.render_item) run low rungs. Rays
    are independent, so any permutation renders identically.

    Returns (permuted rays, inverse index array or None). Apply the
    inverse to per-ray outputs: `out_orig = out_permuted[inv]`.
    """
    n = int(rays["ray_o"].shape[0])
    n_tiles = n // tile
    if n_tiles <= 1:
        return rays, None
    perm = np.arange(n).reshape(tile, n_tiles).T.ravel()
    inv = np.argsort(perm)
    out = {k: jnp.asarray(np.asarray(v)[perm]) for k, v in rays.items()}
    return out, inv


class Engine:
    """One experiment: model + params + jitted render/eval programs."""

    def __init__(self, cfg: Config):
        self.cfg = cfg
        self.model = make_model(cfg)
        self.settings = render_settings(cfg)
        self.novel_pose = bool(cfg.test_novel_pose)
        # multi-device: shard the eval ray sweep over the mesh
        # (parallel/eval_sharding.py); single device: plain jit
        self._mesh = None
        if jax.device_count() > 1 and cfg.get("shard_eval", True):
            from .parallel.mesh import make_mesh

            self._mesh = make_mesh()
        # Adaptive eval-capacity ladder. The compacted eval programs run
        # at a STATIC survivor capacity, but real survivor fractions are
        # frame-dependent and usually far below the config's
        # eval_keep_frac (~4-10% of sampled points vs the 25% default) —
        # dead capacity slots still pay full MLP/compaction/composite
        # cost. render_item starts at the smallest rung, escalates on
        # overflow (last rung = dense, always correct), and uses the
        # measured worst-tile survivor count (`compact_count`) to pick
        # the rung for the next frame. Programs are built lazily per
        # rung and cached for the session.
        #
        # Rungs are QUANTIZED CAPACITIES (4096-point quanta per tile up
        # to the config capacity), not /8 /4 /2 fractions: the render is
        # ~linear in capacity at ~7.5% per 2x rung (BASELINE.md), and a
        # scene settles on 1-2 compiled rungs either way — the fine
        # quanta just land them at the measured need instead of up to
        # 2x above it. The 256-point nudge keeps eval_capacity's
        # int(n*frac) from rounding a quantum down through float error.
        f = float(getattr(self.model, "eval_keep_frac", 0.0) or 0.0)
        self._ladder = []
        if f > 0:
            from .models.common import eval_capacity

            pts = self.settings.eval_tile * (
                self.settings.n_samples + self.settings.n_importance
            )
            cap_max = eval_capacity(pts, f)
            caps = list(range(4096, cap_max + 1, 4096))
            if not caps or caps[-1] != cap_max:
                caps.append(cap_max)
            self._ladder = [(c + 256) / pts for c in caps]
        self._ladder.append(0.0)  # dense rung (no compaction)
        self._eval_level = 0
        self._eval_jits: dict = {}
        # mesh-extraction programs, jitted ONCE with params/frame as
        # arguments: per-item jitted closures would bake the weights in
        # as HLO constants and recompile every frame (see CLAUDE.md)
        self._density_sweep_jit = jax.jit(self._density_sweep)
        self._sdf_sweep_jit = jax.jit(self._sdf_sweep)
        self._observed_grad_jit = jax.jit(self._observed_grad_at)
        self._sdf_at_jit = jax.jit(self._sdf_at)
        # one-frame device cache: eval iterates view-major within a
        # frame, and the frame payload (bw volumes, vis masks) is tens
        # of MB per upload through the remote tunnel
        self._frame_dev_cache: dict = {}
        self.timing = None  # see enable_timing()
        # KNN-family eval pass-1 acceleration: a per-frame packed
        # nearest-vertex distance grid (ops/knn_pallas.py
        # build_pdist_payload) built once per frame and trilerp-gathered
        # by the render programs instead of sweeping all 6890 vertices
        # per sampled point. knn_grid_res 0 disables. Default 96: the
        # conservative margin is the half cell diagonal (2.47 cm at 64,
        # 1.63 at 96) and the build cost difference is ~8 ms/frame
        # amortized across the frame's views (BASELINE.md) — the finer
        # grid shrinks the pass-1 keep (and every downstream capacity).
        res = int(cfg.get("knn_grid_res", 96))
        self._pdist_jit = None
        self._knn_blocks_jit = None
        if (res > 1 and getattr(self.model, "knn_pass1", False)
                and getattr(self.model, "eval_keep_frac", 0.0)):
            from .ops.knn_pallas import (
                build_pdist_payload, build_d5_payload, build_knn_blocks,
            )

            self._pdist_jit = jax.jit(
                functools.partial(build_pdist_payload, res=res)
            )
            # block-culled pass-2 KNN tensors (ops/knn_pallas.py
            # knn_blend_blocked): Morton-sorted vertex blocks + per-frame
            # d5 grid driving a certified tile-radius cull. OFF by
            # default after measurement (v5e, 262k queries x 6912 verts):
            # 136-1012 ms vs 57 ms for the flat kernel across block
            # sizes 1024/512/128 — per-block vector-op overhead dominates
            # at small widths and Morton blocks of a surface cloud are
            # too extended to cull at large widths. Kept as a tested
            # opt-in (exact: max delta 0.0 vs flat) for denser vertex
            # clouds where per-block extents shrink.
            if bool(cfg.get("knn_blocked", False)):
                self._knn_blocks_jit = jax.jit(
                    lambda v, w: (
                        build_d5_payload(v, res=res),
                        build_knn_blocks(v, w),
                    )
                )

    def enable_timing(self):
        """Per-stage wall-time accumulators for the CLI eval wall-time
        decomposition (VERDICT-r4 item 4); read by run_evaluate's
        eval_timing report."""
        self.timing = {}
        return self.timing

    def _tadd(self, key, dt):
        if self.timing is not None:
            self.timing[key] = self.timing.get(key, 0.0) + dt

    def _device_frame(self, item, with_vis: bool = False):
        """frame_arrays(item) with a 1-frame device cache keyed by
        (frame_index, latent_index); optionally caches the visibility
        pack (Ks/RT/msks — constant across views of a frame)."""
        fid = item.get("frame_index")
        cache_key = (
            (int(fid), int(np.asarray(item.get("latent_index", 0))))
            if fid is not None else None
        )
        c = self._frame_dev_cache
        if cache_key is not None and c.get("key") == cache_key:
            self._tadd("frame_cache_hits", 1)
        if cache_key is None or c.get("key") != cache_key:
            t0 = time.time()
            frame = frame_arrays(item)
            if self._pdist_jit is not None and "pvertices" in frame:
                packed, margin, bnds = self._pdist_jit(frame["pvertices"])
                frame = {**frame, "pdist_packed": packed,
                         "pdist_margin": margin, "pdist_bounds": bnds}
                if self._knn_blocks_jit is not None:
                    (d5p, _), (kv, kw, kb) = self._knn_blocks_jit(
                        frame["pvertices"], frame["weights"]
                    )
                    frame.update(
                        d5_packed=d5p, knn_verts=kv, knn_values=kw,
                        knn_bboxes=kb,
                    )
            if self.timing is not None:
                jax.block_until_ready(frame)
                self._tadd("frame_h2d_s", time.time() - t0)
                self._tadd("frame_uploads", 1)
                self._tadd("frame_h2d_bytes", sum(
                    np.asarray(item[k]).nbytes
                    for k in frame if k in item
                ))
            c = {"key": cache_key, "frame": frame}
            self._frame_dev_cache = c if cache_key is not None else {}
        if with_vis and "vis" not in c:
            c["vis"] = tuple(
                jnp.asarray(item[k]) for k in ("Ks", "RT", "msks")
            )
        return (c["frame"], c.get("vis")) if with_vis else c["frame"]

    # ------------------------------------------------- mesh field sweeps
    def _density_sweep(self, params, frame, flat):
        return density_grid_sweep(
            lambda p: self.model.apply(
                params, p, frame, method=self.model.density
            ),
            flat,
        )

    def _sdf_sweep(self, params, frame, flat):
        def field(p):
            _, tnorm = sample_blend_closest_points(
                p, frame["tvertices"], frame["weights"]
            )
            sdf = self.model.apply(
                params, p, method=self.model.canonical_sdf
            )
            return jnp.where(tnorm[..., 0] < 0.1, sdf, 10.0)

        return density_grid_sweep(field, flat)

    def _observed_grad_at(self, params, frame, v):
        return self.model.apply(
            params, v, frame, method=self.model._observed_grad
        )

    def _sdf_at(self, params, frame, v):
        resd = self.model.apply(
            params, v, frame, method=self.model.canonical_resd
        )
        return self.model.apply(
            params, v + resd, method=self.model.canonical_sdf
        )

    def _chunked_vertex_eval(self, jit_fn, params, frame, v):
        """Run a per-vertex field program in fixed-size row chunks.

        The weight-norm field trunks hit the TPU backend's flat-row-count
        miscompile band around ~0.5M rows (see RenderSettings.
        dense_chunk_rows); mesh-vertex evaluations are unbounded in size,
        so they are chunked at the same bound the renderer uses. The last
        chunk is zero-padded to keep one compiled program (pad outputs
        are discarded)."""
        bound = self.settings.dense_chunk_rows
        n = v.shape[0]
        if not bound or n <= bound:
            return np.asarray(jit_fn(params, frame, v))
        outs = []
        for s in range(0, n, bound):
            part = v[s:s + bound]
            pad = bound - part.shape[0]
            if pad:
                part = jnp.pad(part, ((0, pad), (0, 0)))
            o = np.asarray(jit_fn(params, frame, part))
            outs.append(o[:bound - pad] if pad else o)
        return np.concatenate(outs, 0)

    # --------------------------------------------------------- params
    def init_params(self, key, dataset=None):
        n = 8
        z = jnp.ones((n, self.cfg.N_samples))
        wpts = jnp.zeros((*z.shape, 3))
        rd = jnp.ones((n, 3))
        if dataset is None:
            dataset = make_dataset(self.cfg, "test")
        frame = frame_arrays(dataset[0])
        kwargs = {"novel_pose": True} if self.novel_pose else {}
        return jax.jit(
            lambda: self.model.init(key, wpts, rd, z, frame, train=False, **kwargs)
        )()

    def load_params(self, template):
        """Load eval params; `test.epoch` >= 0 pins a specific snapshot
        (reference run.py:23,57,89 pass epoch=cfg.test.epoch into
        net_utils.py:357-396's load_network). When a retained
        best-val-PSNR snapshot (`best.flax`) exists it is preferred by
        default — opt out with `test.use_best False` (beyond the
        reference; see train/checkpoints.py)."""
        epoch = int(self.cfg.get("test", {}).get("epoch", -1))
        use_best = bool(self.cfg.get("test", {}).get("use_best", True))
        out = load_checkpoint(
            self.cfg.trained_model_dir, template,
            epoch=epoch, use_latest=epoch < 0, use_best=use_best,
        )
        if out is None:
            raise FileNotFoundError(
                f"no checkpoint in {self.cfg.trained_model_dir}"
                + (f" for test.epoch {epoch}" if epoch >= 0 else "")
            )
        return out[0]

    # --------------------------------------------------------- render
    def _eval_program(self, frac: float, vis: bool):
        """Jitted whole-image program at capacity rung `frac` (0.0 =
        dense/no compaction), cached per (frac, vis)."""
        key = (frac, vis)
        if key not in self._eval_jits:
            model = self.model
            if hasattr(model, "eval_keep_frac") and frac != float(
                model.eval_keep_frac
            ):
                model = model.clone(eval_keep_frac=frac)
            if vis:
                fn = jax.jit(
                    lambda p, r, f, Ks, RT, msks: render_image(
                        model, p, r, f, self.settings,
                        novel_pose=self.novel_pose,
                        inside_fn=lambda pts: prepare_inside_mask(
                            pts, Ks, RT, msks
                        ),
                    )
                )
            else:
                fn = jax.jit(
                    lambda p, r, f: render_image(
                        model, p, r, f, self.settings,
                        novel_pose=self.novel_pose,
                    )
                )
            self._eval_jits[key] = fn
        return self._eval_jits[key]

    def _pick_level(self, worst_count: int, fallback: int,
                    worst_exact=None) -> int:
        """Smallest ladder rung whose per-tile capacity holds the
        measured worst-tile survivor count with 15% headroom; `fallback`
        (a rung known to work) when none does.

        `worst_exact` (when the model reports `compact_count_exact`):
        the rung must ALSO hold the exact post-filter count in its
        stage-2 capacity — steering on the conservative count alone
        makes frames with exact/conservative keep > stage2_ratio pay an
        extra overflow escalation before settling (ADVICE r3)."""
        from .models.common import eval_capacity, stage2_capacity

        pts_per_tile = self.settings.eval_tile * (
            self.settings.n_samples + self.settings.n_importance
        )
        need = int(worst_count * 1.15) + 1
        ratio = float(getattr(self.model, "stage2_ratio", 0.0) or 0.0)
        need2 = (
            int(worst_exact * 1.15) + 1
            if (worst_exact is not None and ratio > 0) else None
        )
        for i, frac in enumerate(self._ladder[:-1]):
            cap = eval_capacity(pts_per_tile, frac)
            if cap < need:
                continue
            if need2 is not None and stage2_capacity(cap, ratio) < need2:
                continue
            return i
        return fallback

    def _sharded_program(self, frac: float):
        """Jitted sharded whole-image program at capacity rung `frac`,
        cached per frac (see parallel/eval_sharding.py)."""
        key = (frac, "sharded")
        if key not in self._eval_jits:
            from .parallel.eval_sharding import make_sharded_render

            model = self.model
            if hasattr(model, "eval_keep_frac") and frac != float(
                model.eval_keep_frac
            ):
                model = model.clone(eval_keep_frac=frac)
            self._eval_jits[key] = make_sharded_render(
                model, self.settings, self._mesh,
                novel_pose=self.novel_pose,
            )
        return self._eval_jits[key]

    def _run_ladder(self, run_at):
        """Adaptive eval-capacity ladder around `run_at(frac) -> out`:
        start at the remembered rung, escalate on overflow (the returned
        `compact_count` is the TRUE worst-tile survivor count even on
        overflow, so escalation jumps straight to a rung that fits; the
        last rung is dense and always correct), and remember the
        best-fitting rung for the next frame."""
        level = min(self._eval_level, len(self._ladder) - 1)
        last_count = None
        last_exact = None
        while True:
            self._tadd("render_dispatches", 1)
            out = dict(run_at(self._ladder[level]))
            count = out.pop("compact_count", None)
            exact = out.pop("compact_count_exact", None)
            if count is not None:
                last_count = int(np.asarray(count).max())
            if exact is not None:
                last_exact = int(np.asarray(exact).max())
            if not bool(np.asarray(out.pop("compact_overflow", False)).any()):
                break
            dense = len(self._ladder) - 1
            level = max(
                level + 1,
                self._pick_level(last_count, dense, worst_exact=last_exact)
                if last_count is not None else dense,
            )
        self._eval_level = (
            self._pick_level(last_count, level, worst_exact=last_exact)
            if last_count is not None else level
        )
        return out

    def render_item(self, params, item, visibility: bool = False):
        use_vis = visibility and "msks" in item
        if use_vis:
            frame, vis = self._device_frame(item, with_vis=True)
        else:
            frame = self._device_frame(item)
        t_pad0 = time.time()

        tile = self.settings.eval_tile
        n_item = len(item["ray_o"])
        use_mesh = (
            self._mesh is not None and not use_vis
            # sharding needs >= one eval tile of REAL rays per device;
            # below that the bucket is mostly padding (whose points the
            # adaptive ladder would size capacity for) and a single chip
            # renders the frame faster anyway
            and n_item >= tile * self._mesh.shape["dp"]
        )
        if use_mesh:
            # bucket so every shape is divisible by n_dev * tile and the
            # compiled-program set stays small; stride-interleave so the
            # worst tile (and worst device shard) tracks the global
            # survivor fraction
            n_dev = self._mesh.shape["dp"]
            rays, n_valid = eval_rays(item, tile * n_dev)
            rays, inv = interleave_rays(rays, tile)
            self._tadd("pad_s", time.time() - t_pad0)
            self._tadd("rays_bytes", sum(
                v.nbytes for v in rays.values()
            ))
            t_r0 = time.time()
            out = self._run_ladder(
                lambda frac: self._sharded_program(frac)(params, frame, rays)
            )
        else:
            rays, n_valid = eval_rays(item, tile)
            rays, inv = interleave_rays(rays, tile)
            self._tadd("pad_s", time.time() - t_pad0)
            self._tadd("rays_bytes", sum(
                v.nbytes for v in rays.values()
            ))
            t_r0 = time.time()
            out = self._run_ladder(
                lambda frac: (
                    self._eval_program(frac, True)(params, rays, frame, *vis)
                    if use_vis
                    else self._eval_program(frac, False)(params, rays, frame)
                )
            )
        self._tadd("render_s", time.time() - t_r0)
        t_f0 = time.time()
        out = {k: np.asarray(v) for k, v in out.items()}
        self._tadd("fetch_s", time.time() - t_f0)
        self._tadd("fetch_bytes", sum(v.nbytes for v in out.values()))
        if inv is not None:
            out = {k: v[inv] for k, v in out.items()}
        return {k: v[:n_valid] for k, v in out.items()}, n_valid

    # --------------------------------------------------------- mesh
    def canonical_sdf_mesh(self, params, item):
        """Canonical-space SDF marching cubes (sdf_mesh_renderer.py:
        51-81): sweep the sdf network with the KNN filter over the
        item's canonical grid (`model.sdf` works in world space — the
        grid here is canonical), mc at level 0, keep the largest
        component. Returns (verts, tris) in canonical coordinates."""
        pts = np.asarray(item["pts"])
        sh = pts.shape[:3]
        flat = jnp.asarray(pts.reshape(-1, 3))
        frame = self._device_frame(item)
        voxel = float(np.asarray(item["voxel_size"]).ravel()[0])
        sdf = np.asarray(self._sdf_sweep_jit(params, frame, flat))
        cube = (-sdf).reshape(sh)
        cube = np.pad(cube, 10, mode="constant", constant_values=-10)
        verts, tris = marching_cubes(cube, 0.0)
        verts, tris = largest_component(verts, tris)
        if len(verts):
            verts = (verts - 10) * voxel + np.asarray(item["tbounds"])[0]
        return verts, tris

    def repose_canonical_mesh(self, params, verts, item):
        """Re-pose canonical SDF-mesh vertices into the item's frame
        (sdf_mesh_renderer.py:83-102): KNN blend weights at the
        vertices, inverse-displacement correction resd = -normal * sdf
        with normal = d/dx sdf(x + resd(x)) (:90-96), big_A -> T-pose ->
        A LBS, then to world. The canonical topology is frame-invariant,
        so an animation re-uses one extraction across all frames
        (run_animation)."""
        frame = self._device_frame(item)
        v = jnp.asarray(np.asarray(verts, np.float32))
        tbw, _ = sample_blend_closest_points(
            v, frame["tvertices"], frame["weights"]
        )
        normal = self._chunked_vertex_eval(
            self._observed_grad_jit, params, frame, v
        )
        sdf_v = self._chunked_vertex_eval(
            self._sdf_at_jit, params, frame, v
        )
        deformed = v + jnp.asarray(-normal * sdf_v[:, None])
        tpose_pts = pose_points_to_tpose_points(deformed, tbw, frame["big_A"])
        pose_pts = tpose_points_to_pose_points(tpose_pts, tbw, frame["A"])
        world = pose_points_to_world_points(pose_pts, frame["R"], frame["Th"])
        return np.asarray(world)

    def extract_mesh(self, params, item):
        """Marching cubes over the field sweep.

        aninerf path (aninerf_mesh_renderer.py:26-64): world-space density
        grid carved by multi-view visibility, mc at cfg.mesh_th.
        sdf path (sdf_mesh_renderer.py:51-111): canonical sdf grid, mc at
        0, largest component, inverse-displacement correction, re-pose.
        """
        if isinstance(self.model, (SDFPDF, NeuSPDF)):
            verts, tris = self.canonical_sdf_mesh(params, item)
            if len(verts) == 0:
                return {"vertex": verts, "posed_vertex": verts, "triangle": tris}
            return {
                "vertex": verts,
                "posed_vertex": self.repose_canonical_mesh(params, verts, item),
                "triangle": tris,
            }

        # density path (aninerf / aligned / nerf-pdf): world-space grid
        cfg = self.cfg
        pts = np.asarray(item["pts"])
        sh = pts.shape[:3]
        flat = jnp.asarray(pts.reshape(-1, 3))
        frame = self._device_frame(item)
        voxel = float(np.asarray(item["voxel_size"]).ravel()[0])
        sigma = np.asarray(self._density_sweep_jit(params, frame, flat))
        if "msks" in item:
            vis = np.asarray(
                prepare_inside_mask(
                    flat,
                    jnp.asarray(item["Ks"]),
                    jnp.asarray(item["RT"]),
                    jnp.asarray(item["msks"]),
                )
            )
            sigma = np.where(vis, sigma, 0.0)
        cube = sigma.reshape(sh)
        cube = np.pad(cube, 10, mode="constant")
        verts, tris = marching_cubes(cube, float(cfg.mesh_th))
        if len(verts):
            verts = (verts - 10) * voxel + np.asarray(item["wbounds"])[0]
        return {"vertex": verts, "posed_vertex": verts, "triangle": tris}


# ======================================================================
# run types (run.py:4-144)
# ======================================================================

def run_dataset(cfg: Config, max_items: int = 20):
    """Dataloader smoke test (run.py:4-11)."""
    ds = make_dataset(cfg, "train")
    loader = Loader(ds, shuffle=True, max_iter=max_items)
    t0 = time.time()
    n = 0
    for _ in loader:
        n += 1
    dt = time.time() - t0
    print(f"iterated {n} items in {dt:.2f}s ({n / max(dt, 1e-9):.1f} it/s)")
    return n


def run_network(cfg: Config, n_iters: int = 10):
    """Forward latency benchmark (run.py:14-38).

    `profile_dir <path>` additionally captures a jax.profiler trace of
    the post-warmup frames (XLA ops, fusion boundaries, Pallas kernels;
    view in TensorBoard's Profile tab) — the reference's harness offers
    wall-clock only (SURVEY §5 tracing)."""
    eng = Engine(cfg)
    ds = make_dataset(cfg, "test")
    loader = make_test_loader(cfg, ds)
    params = eng.load_params(eng.init_params(jax.random.PRNGKey(0), ds))
    profile_dir = cfg.get("profile_dir", "")
    times = []
    trace = None
    try:
        for i, item in enumerate(loader):
            if i >= n_iters:
                break
            if i == min(1, n_iters - 1) and profile_dir and trace is None:
                # skip the compile/warmup frame when there is more than
                # one; with a single frame, trace it (better than none)
                from .utils.profiling import profile_trace

                trace = profile_trace(profile_dir)
                trace.__enter__()
            t0 = time.time()
            out, _ = eng.render_item(params, item)
            times.append(time.time() - t0)
    finally:
        if trace is not None:
            trace.__exit__(None, None, None)
            print(f"profiler trace written to {profile_dir}")
    mean = float(np.mean(times[1:])) if len(times) > 1 else float(np.mean(times))
    print(f"mean forward: {mean:.4f}s over {len(times)} frames")
    return mean


def run_evaluate(cfg: Config, params=None, max_items: int = -1,
                 save_images: bool = True):
    """PSNR/SSIM evaluation (run.py:41-70)."""
    cfg.eval = True
    if is_image_space(cfg):
        return _run_evaluate_baseline(cfg, params, max_items, save_images)
    eng = Engine(cfg)
    ds = make_dataset(cfg, "test")
    loader = make_test_loader(cfg, ds)
    if params is None:
        params = eng.load_params(eng.init_params(jax.random.PRNGKey(0), ds))
    evaluator = ImageEvaluator(cfg.result_dir)
    # pipeline: the Loader prefetches items on threads (host data prep
    # overlaps the device render), and the metrics/PNG stage runs on a
    # single ordered worker so SSIM + imwrite of frame N overlap the
    # render of frame N+1 (VERDICT-r3 item 3: the CLI's steady-state
    # sec/frame should track the device program, not the sum of host
    # stages)
    from concurrent.futures import ThreadPoolExecutor

    # opt-in per-stage wall-time decomposition (VERDICT-r4 item 4):
    # `eval_timing True` accumulates data-wait / frame-H2D / pad /
    # render-dispatch / fetch / SSIM / PNG seconds and prints one JSON
    # line with a chip-local projection next to the measured s/frame
    timing = eng.enable_timing() if cfg.get("eval_timing", False) else None
    t_start = time.time()
    t_render = 0.0
    t_data_wait = 0.0
    item_walls = []
    futures = []
    n_items = 0
    with ThreadPoolExecutor(max_workers=1) as metrics_pool:
        t_prev = time.time()
        it = iter(loader)
        while True:
            t_w0 = time.time()
            item = next(it, None)
            t_data_wait += time.time() - t_w0
            if item is None or (max_items >= 0 and n_items >= max_items):
                break
            t0 = time.time()
            out, n_valid = eng.render_item(params, item)
            t_render += time.time() - t0
            futures.append(metrics_pool.submit(
                evaluator.evaluate,
                out["rgb_map"],
                np.asarray(item["rgb"]),
                np.asarray(item["mask_at_box"]),
                int(item["H"]),
                int(item["W"]),
                frame_index=int(item["frame_index"]),
                view_index=int(item.get("cam_ind", 0)),
                save_images=save_images,
                timing=timing,
            ))
            # bound in-flight render outputs (each holds H*W*3 floats):
            # a lagging metrics worker must stall the loop, not buffer
            # the whole split
            while len(futures) > 4:
                futures.pop(0).result()
            n_items += 1
            now = time.time()
            item_walls.append(now - t_prev)
            t_prev = now
        for f in futures:
            f.result()
    wall = time.time() - t_start
    if n_items:
        # steady-state excludes the first item (jit compiles + ladder
        # settling); `sec_per_frame_steady` is the CLI headline number
        steady = float(np.median(item_walls[1:])) if n_items > 1 else (
            item_walls[0]
        )
        print(
            f"eval pipeline: {n_items} items in {wall:.2f}s — "
            f"steady {steady:.3f} s/frame (render {t_render / n_items:.3f}"
            f" s/frame avg incl. compile)"
        )
        if timing is not None:
            _print_eval_timing(timing, n_items, steady, wall, t_render,
                               t_data_wait)
    return evaluator.summarize()


# the measured per-dispatch host/tunnel overhead of this sandbox's
# remote-execution relay (CLAUDE.md calibration; re-confirmed by the
# bench.py steady-state protocol's floor self-check). A chip-local
# deployment pays ~0.
RELAY_FLOOR_S = 0.026
# conservative chip-local host<->device copy bandwidth for the H2D/D2H
# projection (PCIe gen3-class; TPU hosts do better)
CHIP_LOCAL_COPY_GBPS = 8.0


def _print_eval_timing(timing, n_items, steady, wall, t_render,
                       t_data_wait):
    """One-JSON-line stage decomposition + chip-local projection
    (VERDICT-r4 item 4). All figures are per-frame averages."""
    import json

    per = {k: v / n_items for k, v in timing.items()}
    dispatches = per.get("render_dispatches", 0.0)
    render_s = per.get("render_s", 0.0)
    fetch_s = per.get("fetch_s", 0.0)
    h2d_s = per.get("frame_h2d_s", 0.0)
    h2d_bytes = per.get("frame_h2d_bytes", 0.0)
    fetch_bytes = per.get("fetch_bytes", 0.0)
    # chip-local projection: the render keeps only its device time
    # (relay floor removed per dispatch), copies run at local bus
    # bandwidth, and the pipelined host stages (data prep, metrics)
    # overlap the render — steady s/frame is the max of the pipeline
    # stages, not their sum
    render_chip = max(render_s - dispatches * RELAY_FLOOR_S, 0.0)
    rays_bytes = per.get("rays_bytes", 0.0)
    copies_chip = (
        h2d_bytes + fetch_bytes + rays_bytes
    ) / (CHIP_LOCAL_COPY_GBPS * 1e9)
    # pad_s is dominated by the padded-ray upload through the tunnel
    # (measured: ~19 MB/frame at 512^2); chip-local it collapses to the
    # host permute + a local copy. Keep the host half (conservatively
    # 50%) and move the bytes to the copy term.
    pad_chip = 0.5 * per.get("pad_s", 0.0)
    device_stage = render_chip + copies_chip + pad_chip
    metrics_stage = per.get("ssim_s", 0.0) + per.get("png_s", 0.0)
    data_stage = t_data_wait / n_items
    projected = max(device_stage, metrics_stage, data_stage)
    print(json.dumps({
        "eval_timing_per_frame": {
            "n_items": n_items,
            "steady_s_per_frame": round(steady, 4),
            "wall_s_total": round(wall, 2),
            "data_wait_s": round(data_stage, 4),
            "frame_h2d_s": round(h2d_s, 4),
            "frame_h2d_mb": round(h2d_bytes / 1e6, 2),
            "frame_uploads_per_frame": round(
                per.get("frame_uploads", 0.0), 3
            ),
            "frame_cache_hits_per_frame": round(
                per.get("frame_cache_hits", 0.0), 3
            ),
            "pad_s": round(per.get("pad_s", 0.0), 4),
            "rays_mb": round(rays_bytes / 1e6, 2),
            "render_s": round(render_s, 4),
            "render_dispatches": round(dispatches, 2),
            "relay_floor_s": round(dispatches * RELAY_FLOOR_S, 4),
            "fetch_s": round(fetch_s, 4),
            "fetch_mb": round(fetch_bytes / 1e6, 2),
            "ssim_s": round(per.get("ssim_s", 0.0), 4),
            "png_s": round(per.get("png_s", 0.0), 4),
            "projected_chip_local_s_per_frame": round(projected, 4),
            "projection": (
                "max(render-floor + local copies + pad/2, ssim+png, "
                "data wait) — pipelined stages overlap; relay floor "
                f"{RELAY_FLOOR_S * 1e3:.0f} ms/dispatch, local copy "
                f"{CHIP_LOCAL_COPY_GBPS:.0f} GB/s; pad halved because "
                "its tunnel-upload share vanishes chip-local"
            ),
        }
    }))


def run_evaluate_external(cfg: Config, pred_dir: str | None = None,
                          max_items: int = -1):
    """Score pre-rendered predictions against dataset ground truth
    (reference run.py:111-124 `run_evaluate_nv` — loader + evaluator
    only). Predictions are read from `pred_dir` (default: the experiment
    comparison dir) as frameXXXX_viewXXXX.png."""
    import cv2

    cfg.eval = True
    ds = make_dataset(cfg, "test")
    loader = make_test_loader(cfg, ds)
    pred_dir = pred_dir or os.path.join(cfg.result_dir, "comparison")
    evaluator = ImageEvaluator(cfg.result_dir)
    n = 0
    for i, item in enumerate(loader):
        if max_items >= 0 and i >= max_items:
            break
        fi = int(item["frame_index"])
        vi = int(item.get("cam_ind", 0))
        path = os.path.join(pred_dir, f"frame{fi:04d}_view{vi:04d}.png")
        if not os.path.exists(path):
            continue
        img = cv2.imread(path)[..., ::-1].astype(np.float32) / 255.0
        mab = np.asarray(item["mask_at_box"]).reshape(-1)
        H, W = int(item["H"]), int(item["W"])
        pred = img.reshape(-1, 3)[mab]
        evaluator.evaluate(
            pred, np.asarray(item["rgb"]), mab, H, W,
            frame_index=fi, view_index=vi, save_images=False,
        )
        n += 1
    if n == 0:
        raise FileNotFoundError(f"no prediction images under {pred_dir}")
    return evaluator.summarize()


def run_visualize(cfg: Config, params=None, max_items: int = -1):
    """Novel view / pose sequence / mesh visualization (run.py:73-102)."""
    eng = Engine(cfg)
    ds = make_dataset(cfg, "test")
    # apply the configured test sampler (the reference's run_visualize
    # goes through make_data_loader, which honors FrameSampler)
    loader = make_test_loader(cfg, ds)
    if params is None:
        params = eng.load_params(eng.init_params(jax.random.PRNGKey(0), ds))

    if cfg.vis_posed_mesh or cfg.vis_tpose_mesh:
        vis = MeshVisualizer(cfg.exp_name)
        evaluator = MeshEvaluator(
            cfg.result_dir,
            data_root=cfg.test_dataset["data_root"],
            human=cfg.test_dataset["human"],
            exp_name=cfg.exp_name,
        )
        results = []
        for i, item in enumerate(loader):
            if max_items >= 0 and i >= max_items:
                break
            mesh = eng.extract_mesh(params, item)
            # tpose export writes the CANONICAL vertices
            # (mesh_visualizer.py:17-24)
            verts = (
                mesh["posed_vertex"] if cfg.vis_posed_mesh
                else mesh["vertex"]
            )
            vis.visualize(
                verts, mesh["triangle"],
                int(item["frame_index"]), posed=cfg.vis_posed_mesh,
            )
            m = evaluator.evaluate(
                mesh["posed_vertex"], mesh["triangle"], int(item["frame_index"])
            )
            results.append(m)
        if evaluator.chamfers:
            evaluator.summarize()
        return results

    if cfg.vis_novel_view:
        vis = NovelViewVisualizer(cfg.exp_name)
    else:
        vis = PoseSequenceVisualizer(cfg.exp_name)
    dump_depth = bool(cfg.get("vis_depth", False))
    # image assembly + PNG writes overlap the next frame's render, same
    # pipeline as run_evaluate (ordered single worker)
    from concurrent.futures import ThreadPoolExecutor

    futures = []
    with ThreadPoolExecutor(max_workers=1) as writer_pool:
        for i, item in enumerate(loader):
            if max_items >= 0 and i >= max_items:
                break
            out, n_valid = eng.render_item(params, item, visibility=True)
            kwargs = {}
            if cfg.vis_novel_view and dump_depth:
                kwargs = {
                    "depth": out.get("depth_map"),
                    "acc": out.get("acc_map"),
                }
            futures.append(writer_pool.submit(
                vis.visualize,
                out["rgb_map"],
                np.asarray(item["mask_at_box"]),
                int(item["H"]),
                int(item["W"]),
                int(item["frame_index"]),
                int(item.get("view_index", 0)),
                **kwargs,
            ))
            while len(futures) > 4:  # bound in-flight frame buffers
                futures.pop(0).result()
        for f in futures:
            f.result()
    return True


def run_animation(cfg: Config, params=None, max_items: int = -1):
    """Animate extracted meshes over the test frame sequence
    (run.py:127-129 — the reference dispatches to `tools/animate_mesh`,
    which is absent from its repo; this is a working implementation).

    SDF families extract the canonical mesh ONCE and re-pose it per
    frame, so the exported sequence shares vertex topology (the property
    mesh-animation pipelines need); density families fall back to
    per-frame extraction. Run with the mesh overlay so the dataset
    provides query grids:

        python run.py --type animation --cfg_file ... vis_posed_mesh True

    Writes PLY frames under data/animation/<exp>/.
    """
    eng = Engine(cfg)
    ds = make_dataset(cfg, "test")
    loader = make_test_loader(cfg, ds)
    if params is None:
        params = eng.load_params(eng.init_params(jax.random.PRNGKey(0), ds))
    vis = MeshVisualizer(cfg.exp_name)
    counts = []
    for item, posed, tris in _posed_mesh_frames(eng, params, loader, max_items):
        vis.visualize(posed, tris, int(item["frame_index"]), posed=True)
        counts.append(len(posed))
    return counts


def _posed_mesh_frames(eng, params, loader, max_items: int = -1):
    """Yield (item, posed_verts, tris) per test frame: canonical-once +
    re-pose for SDF families, per-frame extraction otherwise (shared by
    run_animation and run_raster)."""
    canonical = None
    for i, item in enumerate(loader):
        if max_items >= 0 and i >= max_items:
            break
        if isinstance(eng.model, (SDFPDF, NeuSPDF)):
            if canonical is None:
                canonical = eng.canonical_sdf_mesh(params, item)
            verts, tris = canonical
            posed = (
                eng.repose_canonical_mesh(params, verts, item)
                if len(verts) else verts
            )
        else:
            mesh = eng.extract_mesh(params, item)
            posed, tris = mesh["posed_vertex"], mesh["triangle"]
        yield item, posed, tris


def run_raster(cfg: Config, params=None, max_items: int = -1):
    """Rasterize extracted meshes into a training-view camera
    (run.py:132-135 — the reference dispatches to `tools/rasterizer_mesh`,
    absent from its repo; this is a working implementation on the in-tree
    native z-buffered rasterizer, csrc/mesh_native.cpp).

    Per test frame: posed mesh (same production as run_animation),
    area-weighted vertex normals, headlight lambertian shade in camera
    space, rasterize with the view picked by `raster_view` (default 0).
    Writes data/raster/<exp>/frame<i>_view<v>.png + _depth.npy.
    """
    from .native import rasterize_mesh_native
    from .render.mesh import vertex_normals
    from .visualizers.image import _write

    eng = Engine(cfg)
    ds = make_dataset(cfg, "test")
    loader = make_test_loader(cfg, ds)
    if params is None:
        params = eng.load_params(eng.init_params(jax.random.PRNGKey(0), ds))
    view = int(cfg.get("raster_view", 0))
    out_dir = os.path.join("data", "raster", cfg.exp_name)
    written = []
    for item, posed, tris in _posed_mesh_frames(eng, params, loader, max_items):
        K = np.asarray(item["Ks"][view], np.float32)
        RT = np.asarray(item["RT"][view], np.float32)
        R, T = RT[:3, :3], RT[:3, 3]
        H, W = np.asarray(item["msks"]).shape[1:3]
        if len(posed) == 0 or len(tris) == 0:
            img = np.zeros((int(H), int(W), 3), np.float32)
            depth = np.zeros((int(H), int(W)), np.float32)
        else:
            # headlight shade: |n_cam . optical axis|
            n_cam = vertex_normals(np.asarray(posed), np.asarray(tris)) @ R.T
            shade = np.abs(n_cam[:, 2:3]) * np.ones((1, 3), np.float32)
            out = rasterize_mesh_native(
                posed, tris, shade, K, R, T, int(H), int(W)
            )
            if out is None:
                raise SystemExit(
                    "native rasterizer unavailable (csrc/mesh_native.cpp "
                    "needs g++) — run.py --type raster requires it"
                )
            img, depth = out["attr"], out["depth"]
        fi = int(item["frame_index"])
        _write(os.path.join(out_dir, f"frame{fi:04d}_view{view:04d}.png"), img)
        np.save(
            os.path.join(out_dir, f"frame{fi:04d}_view{view:04d}_depth.npy"),
            depth,
        )
        written.append(fi)
    return written


# ======================================================================
# training driver (train_net.py:18-63)
# ======================================================================

def _periodic_eval(cfg, params, ctx):
    """In-training validation with a CACHED Engine/dataset (rebuilding
    them re-jits the eval renderer every eval epoch)."""
    if "eng" not in ctx:
        ecfg = cfg.clone()
        ecfg.eval = True
        ctx["eng"] = Engine(ecfg)
        ctx["ds"] = make_dataset(ecfg, "test")
        ctx["cfg"] = ecfg
    eng, ds, ecfg = ctx["eng"], ctx["ds"], ctx["cfg"]
    evaluator = ImageEvaluator(ecfg.result_dir)
    for i in range(min(2, len(ds))):
        item = ds[i]
        out, _ = eng.render_item(params, item)
        evaluator.evaluate(
            out["rgb_map"], np.asarray(item["rgb"]),
            np.asarray(item["mask_at_box"]),
            int(item["H"]), int(item["W"]),
            frame_index=int(item["frame_index"]),
            view_index=int(item.get("cam_ind", 0)),
            save_images=False,
        )
    return evaluator.summarize()


def run_train(cfg: Config, epochs: int | None = None, mesh=None,
              guard=None):
    from .train.animation import AnimationTrainer

    if is_image_space(cfg):
        return _run_train_baseline(cfg, epochs, guard=guard)
    model = make_model(cfg)
    if cfg.aninerf_animation:
        trainer = AnimationTrainer(cfg, model, mesh=mesh)
    else:
        # mesh => explicit-SPMD shard_map DP step (one frame per device)
        trainer = Trainer(cfg, model, mesh=mesh)

    ds = make_dataset(cfg, "train")
    is_main = jax.process_index() == 0
    recorder = Recorder(cfg.record_dir, resume=cfg.resume, is_main=is_main)

    n_epochs = epochs if epochs is not None else cfg.train.epoch

    # prefetch must cover the fused-dispatch depth: train_epoch drains
    # steps_per_dispatch items back-to-back between device waits, so a
    # prefetch window smaller than that stalls the loop on per-item
    # host sampling instead of hiding it inside the ~0.2-0.6 s dispatch
    # (measured: 20 ms/step of exposed data wait at K=16 with the old
    # fixed window of 4+threads; ~0 when the window covers 2 dispatches)
    k_dispatch = int(cfg.train.get("steps_per_dispatch", 1) or 1)
    loader = Loader(
        ds,
        shuffle=True,
        max_iter=cfg.ep_iter if cfg.ep_iter > 0 else -1,
        num_shards=jax.process_count(),
        shard_id=jax.process_index(),
        num_threads=cfg.train.get("num_workers", 8) // 2 or 1,
        prefetch=max(2 * k_dispatch, 4),
    )
    # ETA basis: ep_iter <= 0 means full-dataset epochs (len(loader)
    # reflects the per-shard iteration count either way)
    max_iter = n_epochs * max(len(loader), 1)

    # init / resume. fix_random pins the sampling key chain; otherwise
    # it varies per wall-clock start (reference train_net.py:12-15:
    # determinism is opt-in)
    probe = [collate_rays(ds[0], cfg.N_rand)]
    if cfg.fix_random:
        key = jax.random.PRNGKey(0)
        if hasattr(ds, "_rng"):
            ds._rng = np.random.RandomState(0)
    else:
        key = jax.random.PRNGKey(int(time.time()) & 0x7FFFFFFF)
    state = trainer.init_state(jax.random.PRNGKey(42), stack_batch(probe))

    # stage-2 init from the stage-1 checkpoint (tpose_nerf_network.py:34-38).
    # A missing init checkpoint is an ERROR, not a silent cold start —
    # stage 2 trained against a random frozen canonical field is garbage.
    if cfg.aninerf_animation and cfg.init_aninerf != "no_pretrain":
        from .train.checkpoints import load_params_partial

        init_dir = os.path.join(
            os.path.dirname(cfg.trained_model_dir), cfg.init_aninerf
        )
        if not os.path.isdir(init_dir):
            init_dir = os.path.join(
                "data/trained_model/deform", cfg.init_aninerf
            )
        if not os.path.isdir(init_dir):
            raise FileNotFoundError(
                f"init_aninerf checkpoint dir not found: {init_dir} "
                "(train stage 1 first, or pass init_aninerf no_pretrain)"
            )
        params = load_params_partial(init_dir, state.params, strict=False)
        state = state._replace(params=params)
    if cfg.get("init_sdf"):
        from .train.checkpoints import load_params_partial

        init_dir = os.path.join("data/trained_model", cfg.task, cfg.init_sdf)
        if not os.path.isdir(init_dir):
            raise FileNotFoundError(
                f"init_sdf checkpoint dir not found: {init_dir}"
            )
        params = load_params_partial(
            init_dir, state.params,
            only=["params/tpose_human/sdf_network", "params/sdf_network"],
            strict=False,
        )
        state = state._replace(params=params)

    begin_epoch = 0
    if cfg.resume:
        out = load_checkpoint(
            cfg.trained_model_dir, state.params,
            state.opt_state,
        )
        if out is not None:
            params, opt_state, epoch0, step, rec = out
            state = state._replace(
                params=params, opt_state=opt_state, step=jnp.asarray(step)
            )
            begin_epoch = epoch0 + 1
            recorder.load_state_dict(rec)
    elif os.path.isdir(cfg.trained_model_dir):
        import shutil

        shutil.rmtree(cfg.trained_model_dir, ignore_errors=True)

    # device-resident frame store: per-frame bw volumes/transforms upload
    # once, steps gather by slot (H2D was the measured train bottleneck)
    store = None
    if cfg.train.get("frame_store_mb", 0) > 0:
        from .train.trainer import build_frame_store

        # KNN-family models with train-time compaction: bake per-frame
        # packed distance grids into the store so the train pass 1 runs
        # as a conservative grid trilerp (models/pdf.py _train_compacted)
        pdist_res = (
            int(cfg.get("knn_grid_res", 64))
            if (getattr(model, "knn_pass1", False)
                and float(cfg.get("train_keep_frac", 0.0)) > 0)
            else 0
        )
        store = build_frame_store(
            ds, mesh=mesh, max_mb=cfg.train.frame_store_mb,
            pdist_res=pdist_res,
        )

    # preemption safety (beyond the reference, which loses everything
    # since the last save on SIGTERM): first signal -> finish the
    # in-flight dispatch, save a resumable latest checkpoint, return
    from .train.trainer import PreemptionGuard

    if guard is None:
        guard = PreemptionGuard()
    _eval_ctx: dict = {}
    try:
        for epoch in range(begin_epoch, n_epochs):
            state, key = trainer.train_epoch(
                state, loader, recorder, key, epoch, max_iter, mesh=mesh,
                log_interval=cfg.log_interval,
                record_interval=cfg.record_interval,
                store=store, guard=guard,
            )
            if guard.should_stop:
                if is_main:
                    # stamp epoch-1: resume (begin_epoch = saved+1)
                    # REPLAYS the interrupted epoch's iterations instead
                    # of silently skipping its remainder
                    save_checkpoint(
                        cfg.trained_model_dir, state.params, state.opt_state,
                        epoch - 1, int(state.step), recorder.state_dict(),
                        latest=True,
                    )
                    print(
                        f"[train] preempted during epoch {epoch}: saved a "
                        f"latest checkpoint (step {int(state.step)}); "
                        "resume with `resume True` (the interrupted epoch "
                        "replays)"
                    )
                return state
            if is_main:
                if (epoch + 1) % cfg.save_ep == 0:
                    save_checkpoint(
                        cfg.trained_model_dir, state.params, state.opt_state,
                        epoch, int(state.step), recorder.state_dict(),
                    )
                if (epoch + 1) % cfg.save_latest_ep == 0 or epoch == n_epochs - 1:
                    save_checkpoint(
                        cfg.trained_model_dir, state.params, state.opt_state,
                        epoch, int(state.step), recorder.state_dict(),
                        latest=True,
                    )
            if (epoch + 1) % cfg.eval_ep == 0 and not cfg.skip_eval and is_main:
                m = _periodic_eval(cfg, state.params, _eval_ctx)
                # PSNR-vs-step curve in scalars.jsonl ("val" lines):
                # the instrument for schedule-regression diagnosis
                # (VERDICT-r3 item 6)
                recorder.record(
                    "val", extra={f"val_{k}": v for k, v in m.items()}
                )
                # mechanized best-checkpoint retention (VERDICT-r4
                # item 2): non-monotone curves (the measured SDF
                # silhouette-BCE oscillation) no longer need a human
                # reading scalars.jsonl — eval picks best.flax
                if np.isfinite(m.get("psnr", float("nan"))):
                    if save_best_checkpoint(
                        cfg.trained_model_dir, state.params,
                        state.opt_state, epoch, int(state.step),
                        m["psnr"], recorder.state_dict(),
                    ):
                        print(
                            f"[train] new best val psnr {m['psnr']:.3f} "
                            f"dB at epoch {epoch} -> best.flax"
                        )
    finally:
        guard.restore()
    return state


def _run_train_baseline(cfg: Config, epochs: int | None = None,
                        guard=None):
    """Full-image training loop for NHR/NT (lib/train/trainers/nhr.py)."""
    from .train.baseline import BaselineTrainer
    from .train.trainer import PreemptionGuard

    if guard is None:
        guard = PreemptionGuard()

    model = make_model(cfg)
    trainer = BaselineTrainer(cfg, model)
    ds = make_dataset(cfg, "train")
    is_main = jax.process_index() == 0
    recorder = Recorder(cfg.record_dir, resume=cfg.resume, is_main=is_main)
    n_epochs = epochs if epochs is not None else cfg.train.epoch

    loader = Loader(
        ds, shuffle=True,
        max_iter=cfg.ep_iter if cfg.ep_iter > 0 else -1,
        num_shards=jax.process_count(), shard_id=jax.process_index(),
        num_threads=2,
    )
    # ETA basis (ep_iter <= 0 => full-dataset epochs)
    max_iter = n_epochs * max(len(loader), 1)
    state = trainer.init_state(jax.random.PRNGKey(42), ds[0])

    begin_epoch = 0
    if cfg.resume:
        out = load_checkpoint(
            cfg.trained_model_dir, state.params, state.opt_state
        )
        if out is not None:
            params, opt_state, epoch0, step, rec = out
            state = state._replace(
                params=params, opt_state=opt_state, step=jnp.asarray(step)
            )
            begin_epoch = epoch0 + 1
            recorder.load_state_dict(rec)

    try:
        for epoch in range(begin_epoch, n_epochs):
            loader.set_epoch(epoch)
            recorder.epoch = epoch
            end = time.time()
            for item in loader:
                if guard.should_stop:
                    break
                data_time = time.time() - end
                state, stats = trainer.train_step(state, item)
                stats = {k: float(v) for k, v in stats.items()}  # sync
                recorder.step += 1
                recorder.update_stats(stats)
                recorder.batch_time.update(time.time() - end)
                recorder.data_time.update(data_time)
                end = time.time()
                if recorder.step % cfg.log_interval == 0:
                    print(
                        recorder.log_line(
                            max_iter,
                            float(trainer.sched(int(state.step))),
                        )
                    )
            if guard.should_stop:
                if is_main:
                    save_checkpoint(
                        cfg.trained_model_dir, state.params, state.opt_state,
                        epoch - 1, int(state.step), recorder.state_dict(),
                        latest=True,
                    )
                return state
            if is_main and (
                (epoch + 1) % cfg.save_latest_ep == 0 or epoch == n_epochs - 1
            ):
                save_checkpoint(
                    cfg.trained_model_dir, state.params, state.opt_state,
                    epoch, int(state.step), recorder.state_dict(), latest=True,
                )
    finally:
        guard.restore()
    return state


def _run_evaluate_baseline(cfg: Config, params=None, max_items: int = -1,
                           save_images: bool = True):
    """Full-image PSNR/SSIM for NHR/NT (lib/evaluators/nhr.py, nt.py)."""
    from .train.baseline import BaselineTrainer

    model = make_model(cfg)
    trainer = BaselineTrainer(cfg, model)
    ds = make_dataset(cfg, "test")
    loader = make_test_loader(cfg, ds)
    if params is None:
        state = trainer.init_state(jax.random.PRNGKey(0), ds[0])
        out = load_checkpoint(cfg.trained_model_dir, state.params)
        if out is None:
            raise FileNotFoundError(
                f"no checkpoint in {cfg.trained_model_dir}"
            )
        params = out[0]
    evaluator = ImageEvaluator(cfg.result_dir)
    apply_jit = jax.jit(lambda p, f: model.apply(p, f, train=False))
    for i, item in enumerate(loader):
        if max_items >= 0 and i >= max_items:
            break
        frame = trainer._frame(item)
        out = apply_jit(params, frame)
        pred = np.asarray(out["rgb_map"])
        gt = np.asarray(item["img"])
        mab = np.asarray(item["mask_at_box"]).reshape(-1)
        H, W = gt.shape[:2]
        evaluator.evaluate(
            pred.reshape(-1, 3)[mab], gt.reshape(-1, 3)[mab], mab, H, W,
            frame_index=int(item["frame_index"]),
            view_index=int(item.get("cam_ind", 0)),
            save_images=save_images,
        )
    return evaluator.summarize()
