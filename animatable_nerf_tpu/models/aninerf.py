"""AniNeRF: neural blend-weight field + canonical NeRF (the original
ICCV'21 model, grid-based blend-weight lookups).

Capability parity with lib/networks/bw_deform/tpose_nerf_network.py,
re-designed for TPU: one fused program over all (ray, sample) points,
masked compute instead of boolean compaction, channels-last matmuls.

Expected `frame` dict keys (produced by the data layer, matching
tpose_dataset.py:236-277):
  R (3,3), Th (1,3) or (3,) — SMPL->world rotation/translation
  A (24,4,4) — per-bone rigid transforms of this frame's pose
  pbw (D,H,W,25), pbounds (2,3) — posed blend-weight volume (+distance ch)
  tbw (D',H',W',25), tbounds (2,3) — canonical (T-pose) volume
  latent_index (), bw_latent_index () — int32 scalars
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core import (
    world_points_to_pose_points,
    world_dirs_to_pose_dirs,
    pose_points_to_tpose_points,
    tpose_points_to_pose_points,
    pts_sample_blend_weights,
)
from ..core.grid import pack_corner_volume, pts_sample_blend_weights_packed
from ..core.sampling import z_vals_to_dists
from ..fields import BlendWeightField, TPoseNeRF
from .common import (
    keep_mask_with_argmin,
    inside_bounds,
    broadcast_viewdirs,
    raw_alpha_from_sigma,
    compact_payload,
    scatter_compacted_raw,
    eval_capacity,
    survivor_count,
    take_rows,
    substitute_masked,
)

# Segment capacity headroom of the hierarchical eval pre-filter: the
# conservative Lipschitz-margin candidate set measures ~2x the exact
# survivor count, so the segment-level capacity covers this multiple of
# the point-level keep fraction (engine ladder escalation covers the
# rest).
_SEG_CAPACITY_FACTOR = 4
# The slab pre-filter's candidate set is tighter (measured 31-41% of
# segments at a 9%-in-shell scene vs the ladder's 12.5% rung,
# tools/bench_ray_carve_probe.py), and every unused capacity slot pays
# full pass-1b + compaction cost — so its headroom factor is smaller.
_SLAB_SEG_FACTOR = 3


class AniNeRF(nn.Module):
    """Grid-based blend-weight AniNeRF.

    num_train_frames: rows of the appearance latent table; the bw latent
      table has num_train_frames + 1 rows (row 0 = canonical, row i+1 =
      frame i — tpose_nerf_network.py:17,96,173).
    num_eval_frames: rows of the stage-2 novel-pose bw latent table
      (> 0 instantiates the `novel_pose_bw` field, :278-315).
    """

    num_train_frames: int
    num_eval_frames: int = 0
    norm_th: float = 0.05
    train_th: float = 0.0
    xyz_res: int = 10
    view_res: int = 4
    # compute dtype of the MLP trunks (params stay f32; geometric math,
    # filtering and compositing stay f32), used by the XLA fallback path;
    # `fused` routes the trunks through the Pallas kernel on TPU.
    dtype: Any = jnp.float32
    fused: bool = False
    # Eval-time survivor compaction: only this fraction of the sampled
    # points runs the full warp+field pipeline (the rest fail the pnorm
    # filter and contribute exactly 0 — reference compacts them away
    # dynamically, tpose_nerf_network.py:158-161; here the survivor list
    # has static capacity). Exact parity while survivors fit the
    # capacity; overflow drops the latest points. 0 disables.
    eval_keep_frac: float = 0.25
    # Hierarchical eval pre-filter: group each ray's samples into
    # seg_filter-sample segments and test each ONCE at its midpoint
    # with a certified Lipschitz margin (common.py segment_prefilter)
    # before the exact per-point filter runs on the candidate set.
    # OFF by default after end-to-end measurement (v5e, whole-frame
    # realistic scene): at eval sample spacing (~3cm) the conservative
    # margin (lip * segment half-extent) dwarfs the 5cm shell, so the
    # candidate set inflates 7-8x over the exact survivors and the win
    # over the flat pass-1 is <=10% (159.5 vs 175.4 ms at the 3.125%
    # capacity rung, seg_filter=8) — before accounting for the larger
    # capacity rung its segment stream forces the engine ladder onto.
    # seg_filter=4 additionally CRASHES the TPU backend compiler
    # (regalloc RET_CHECK in scalar-address-calculation) at whole-frame
    # shapes. Kept as a tested opt-in for workloads with finer sample
    # spacing (where half-extent << shell thickness the math favors it).
    seg_filter: int = 0
    # Slab segment pre-filter (pass 0): the production eval fast path.
    # Occupied-supercell boxes of the distance volume (EXACT conservative
    # — trilerp is multilinear, so a cell can contain an in-shell point
    # only if a corner is in-shell; common.py occupied_supercell_boxes)
    # + a per-ray slab-test union span; only segments whose z range
    # overlaps the span become candidates (~31% of segments at 9%
    # in-shell samples on the representative scene, measured by
    # tools/bench_ray_carve_probe.py). No gathers, no Lipschitz margin:
    # pass 1 and both compactions then run on the candidate stream only.
    # REQUIRES the renderer invariant wpts = ray_o + viewdir * z (holds
    # for render_rays/render_image; NOT for arbitrary wpts — hence off
    # by default at the model level and enabled by make_model/bench).
    # Value = samples per segment (0 disables); takes precedence over
    # seg_filter.
    slab_filter: int = 0
    # Edge length of a supercell in cells (4 -> ~10 cm at the
    # reference's 2.5 cm voxels) and the static capacity of the
    # occupied-box list (box-list overflow keeps every segment —
    # conservative, just slow). The slab test costs rays x capacity
    # VPU flops per frame: s=2 needs ~3k boxes and measured ~25 ms at
    # whole-frame scale for ~10% tighter candidates than s=4's ~500
    # boxes at ~6 ms — s=4 wins end to end.
    slab_supercell: int = 4
    slab_box_capacity: int = 1024
    # Train-time survivor compaction: same two-pass scheme on the
    # TRAINING path (gather survivors -> MLPs -> scatter raw; the bw
    # consistency pair stays on the compacted stream). Gradients flow
    # through the gather, so the loss and its grads equal the dense
    # masked path exactly while survivors fit the capacity; overflow is
    # reported per step in `compact_overflow` (raise the frac). Pays
    # where the pnorm shell is tight (real SMPL data at norm_th 0.05
    # keeps ~10% of sampled points); off by default because overflow
    # during training silently subsamples the batch. 0 disables.
    train_keep_frac: float = 0.0

    def setup(self):
        self.bw_field = BlendWeightField(
            num_latents=self.num_train_frames + 1, xyz_res=self.xyz_res,
            dtype=self.dtype, fused=self.fused,
        )
        self.tpose_human = TPoseNeRF(
            num_latents=self.num_train_frames,
            xyz_res=self.xyz_res,
            view_res=self.view_res,
            dtype=self.dtype, fused=self.fused,
        )
        if self.num_eval_frames > 0:
            self.novel_pose_bw = BlendWeightField(
                num_latents=self.num_eval_frames, xyz_res=self.xyz_res,
                dtype=self.dtype, fused=self.fused,
            )

    def pose_to_canonical(self, pose_pts, init_pbw, frame, novel_pose: bool):
        """Warp posed-SMPL points to canonical space with neural blend
        weights (tpose_nerf_network.py:79-100)."""
        if novel_pose:
            pbw = self.novel_pose_bw(
                pose_pts, init_pbw, frame["bw_latent_index"]
            )
        else:
            pbw = self.bw_field(pose_pts, init_pbw, frame["latent_index"] + 1)
        tpose = pose_points_to_tpose_points(pose_pts, pbw, frame["A"])
        return tpose, pbw

    def density(self, wpts, frame, novel_pose: bool = False):
        """Canonical density at world points (mesh extraction path,
        tpose_nerf_network.py:105-137). wpts (N,3) -> sigma (N,)."""
        pose_pts = world_points_to_pose_points(wpts, frame["R"], frame["Th"])
        init_pbw = jax.lax.stop_gradient(
            pts_sample_blend_weights_packed(
                pose_pts, pack_corner_volume(frame["pbw"]),
                frame["pbounds"], n_channels=frame["pbw"].shape[-1],
            )
        )
        pnorm = init_pbw[..., 24]
        # mesh path uses a fixed 0.1 threshold (:113-115)
        mask = keep_mask_with_argmin(pnorm, 0.1)
        tpose, _ = self.pose_to_canonical(
            pose_pts, init_pbw[..., :24], frame, novel_pose
        )
        sigma = self.tpose_human.density(tpose)
        return jnp.where(mask, sigma, 0.0)

    # ------------------------------------------------------- stage 2
    def _bw_consistency_select(self, sigma, keep):
        """alpha > train_th selection with forced argmax
        (aninerf_animation_trainer.py:85-90)."""
        d = jax.lax.stop_gradient(jnp.where(keep, sigma, -jnp.inf))
        return (d > self.train_th) | jax.nn.one_hot(
            jnp.argmax(d), d.shape[-1], dtype=bool
        )

    def animation_from_pose(self, pose_pts, frame):
        """Stage-2 consistency pair sampled in observation space
        (aninerf_animation_trainer.py:58-93 `ppts_to_tpose`).

        Returns (pbw, tbw, select_mask) for smooth-L1 consistency."""
        pbw25 = pts_sample_blend_weights(pose_pts, frame["pbw"], frame["pbounds"])
        init_pbw, pnorm = pbw25[..., :24], pbw25[..., 24]
        pbw = self.novel_pose_bw(pose_pts, init_pbw, frame["bw_latent_index"])
        tpose = pose_points_to_tpose_points(pose_pts, pbw, frame["A"])
        tbw25 = pts_sample_blend_weights(tpose, frame["tbw"], frame["tbounds"])
        tbw = self.bw_field(
            tpose, tbw25[..., :24], jnp.zeros_like(frame["bw_latent_index"])
        )
        sigma = self.tpose_human.density(tpose)
        keep = inside_bounds(tpose, frame["tbounds"]) & (pnorm < self.norm_th)
        sigma = jnp.where(keep, sigma, 0.0)
        return pbw, tbw, self._bw_consistency_select(sigma, keep)

    def animation_from_canonical(self, tpts, frame):
        """Stage-2 pair sampled in canonical space
        (aninerf_animation_trainer.py:96-122 `tpose_to_ppts`)."""
        tbw25 = pts_sample_blend_weights(tpts, frame["tbw"], frame["tbounds"])
        tbw = self.bw_field(
            tpts, tbw25[..., :24], jnp.zeros_like(frame["bw_latent_index"])
        )
        sigma = self.tpose_human.density(tpts)
        pose_pts = tpose_points_to_pose_points(tpts, tbw, frame["A"])
        pbw25 = pts_sample_blend_weights(pose_pts, frame["pbw"], frame["pbounds"])
        pbw = self.novel_pose_bw(
            pose_pts, pbw25[..., :24], frame["bw_latent_index"]
        )
        keep = jnp.ones(sigma.shape, dtype=bool)
        return pbw, tbw, self._bw_consistency_select(sigma, keep)

    def _compact_inputs(self, pose_pts, vd, dists, z_flat, frame,
                        keep_frac, conservative: bool = False):
        """Pass 1 shared by the eval AND train compacted paths:
        interpolate ONLY the distance channel (cheap 8-float gather
        rows), filter by the norm_th shell (tpose_nerf_network.py:
        149-157 semantics incl. the forced argmin), compact to a fixed
        capacity.

        `conservative` (eval path) gathers bf16 distance rows — half
        the gather row bytes of the dominant pass-1 cost — and widens
        the threshold by a bound on the bf16 rounding of the corners
        near the shell (|corner| <= th + lip * cell diagonal for a
        lip-Lipschitz field, certified from the volume itself), so the
        survivor set is a SUPERSET of the exact one; _eval_finish then
        re-applies the exact f32 filter from the 25-channel pass-2
        gather it already pays for. Exact end to end (empty-frame
        forced-argmin caveat as in segment_prefilter)."""
        from .common import volume_lipschitz_bound

        cap = eval_capacity(pose_pts.shape[0], keep_frac)
        if conservative:
            dist_packed, th = self._conservative_dist_rows(frame)
        else:
            dist_packed = pack_corner_volume(frame["pbw"][..., 24:25])
            th = jnp.float32(self.norm_th)
        pnorm = pts_sample_blend_weights_packed(
            pose_pts, dist_packed, frame["pbounds"], n_channels=1
        )[..., 0]
        pind = keep_mask_with_argmin(pnorm, th)
        sidx, slot_valid, (c_pose, c_vd, c_dists, c_z), n, overflow = (
            compact_payload(pind, [pose_pts, vd, dists, z_flat], cap)
        )
        return (sidx, slot_valid, c_pose, c_vd, c_dists, c_z, n,
                overflow, pind)

    def _conservative_dist_rows(self, frame):
        """bf16 corner-packed distance rows + a certified widened
        threshold: half the gather row bytes of the dominant pass-1
        cost, survivor set a SUPERSET of the exact one (bf16 rounding of
        corners near the shell is bounded by |corner| <= norm_th +
        lip * cell diagonal for a lip-Lipschitz field, certified from
        the volume itself); pass 2 re-applies the exact f32 filter."""
        from .common import volume_lipschitz_bound

        dist_vol = frame["pbw"][..., 24:25]
        dist_packed = pack_corner_volume(dist_vol).astype(jnp.bfloat16)
        lip = volume_lipschitz_bound(dist_vol[..., 0], frame["pbounds"])
        cell = (frame["pbounds"][1] - frame["pbounds"][0]) / (
            jnp.array(dist_vol.shape[:3], jnp.float32) - 1.0
        )
        corner_bound = self.norm_th + lip * jnp.linalg.norm(cell)
        return dist_packed, jnp.float32(self.norm_th) + corner_bound * (
            2.0 ** -8
        )

    def _eval_compacted_hier(self, wpts, viewdir, z_vals, frame,
                             novel_pose, precomposite, inside_fn=None):
        """Hierarchical eval render: conservative segment pre-filter ->
        exact per-point filter on the candidates -> pass-2 pipeline.

        The flat compacted path interpolates the distance channel at all
        R*S points and sorts R*S keys — at whole-frame scale (16.8M
        points) those two ARE the render cost (measured ~60 + ~33 ms of
        a 206 ms frame, v5e). Here each ray's samples are grouped into
        `seg_filter`-sample segments tested once at their midpoint with
        a certified Lipschitz margin (common.py segment_prefilter):
        pass 1 shrinks seg_filter-fold and the exact filter + both
        compactions run only on the ~2x-of-exact candidate stream. The
        dense wpts tensor is never materialized (only wpts[:, 0] is
        read to recover ray origins; XLA DCEs the rest).

        Numerics: the candidate set provably contains every point with
        pnorm < norm_th, and the exact filter re-runs on candidates, so
        the survivor set — and the render — equals the flat/dense paths'
        (empty-frame forced-argmin caveat: see segment_prefilter).
        """
        from .common import (
            segment_prefilter,
            take_rows,
            volume_lipschitz_bound,
        )

        n_rays, n_samples = z_vals.shape
        seg = self.seg_filter
        factor = _SEG_CAPACITY_FACTOR
        n_pts = n_rays * n_samples
        n_segments = n_pts // seg
        cap = eval_capacity(n_pts, self.eval_keep_frac)
        seg_cap = eval_capacity(
            n_pts, min(1.0, factor * self.eval_keep_frac)
        ) // seg

        # ray origins from the first sample; the rest of wpts is dead
        ray_o = wpts[:, 0, :] - viewdir * z_vals[:, 0:1]

        dist_packed = pack_corner_volume(frame["pbw"][..., 24:25])
        th1 = jnp.float32(self.norm_th)
        lip = volume_lipschitz_bound(
            frame["pbw"][..., 24], frame["pbounds"]
        )

        def mid_dist(p):
            pp = world_points_to_pose_points(p, frame["R"], frame["Th"])
            return pts_sample_blend_weights_packed(
                pp, dist_packed, frame["pbounds"], n_channels=1
            )[..., 0]

        seg_sidx, seg_valid, seg_count = segment_prefilter(
            ray_o, viewdir, z_vals, mid_dist, self.norm_th, lip,
            seg, seg_cap,
        )

        # expand surviving segments to candidate points; all gathers run
        # at segment granularity (seg_cap rows), not point granularity.
        # TPU gathers cost per ROW (core/grid.py), so the per-segment
        # payloads are packed into ONE row each: (z, dists) 2*seg floats
        # and (ray_o, viewdir) 6 floats.
        zd_pack = jnp.concatenate(
            [
                z_vals.reshape(n_segments, seg),
                z_vals_to_dists(z_vals).reshape(n_segments, seg),
            ],
            axis=-1,
        )
        c_zd = take_rows(zd_pack, seg_sidx)
        c_z_seg, c_dists_seg = c_zd[:, :seg], c_zd[:, seg:]
        ray_id = seg_sidx // (n_samples // seg)
        c_ray = take_rows(
            jnp.concatenate([ray_o, viewdir], axis=-1), ray_id
        )
        c_o, c_d = c_ray[:, :3], c_ray[:, 3:]
        cand_w = c_o[:, None, :] + c_d[:, None, :] * c_z_seg[..., None]
        cand_pose = world_points_to_pose_points(
            cand_w.reshape(-1, 3), frame["R"], frame["Th"]
        )
        cand_valid = jnp.repeat(seg_valid, seg)
        cand_pidx = jnp.minimum(
            (seg_sidx[:, None] * seg
             + jnp.arange(seg, dtype=seg_sidx.dtype)).reshape(-1),
            n_pts,
        )

        # per-point filter on the candidates (pass 1b; exact in lip mode,
        # certified-conservative bf16 in slab mode — pass 2 re-checks)
        pnorm = pts_sample_blend_weights_packed(
            cand_pose, dist_packed, frame["pbounds"], n_channels=1
        )[..., 0].astype(jnp.float32)
        pnorm = jnp.where(cand_valid, pnorm, jnp.inf)
        keep_cand = keep_mask_with_argmin(pnorm, th1)
        exact_count = jnp.sum((pnorm < th1).astype(jnp.int32))

        # final point compaction (candidate stream -> capacity); the
        # candidate stream is ascending in original point index, so the
        # stable compaction keeps sidx sorted as composite requires
        cand_vd = jnp.repeat(c_d, seg, axis=0)
        payload = [cand_pose, cand_vd, c_dists_seg.reshape(-1),
                   c_z_seg.reshape(-1)]
        if inside_fn is not None:
            # carve from the REBUILT candidate world points: gathering
            # dense wpts rows would force XLA to materialize the full
            # R*S point set this path exists to avoid (only wpts[:, 0]
            # is read; same f32-rebuild rounding class as cand_pose)
            payload.append(cand_w.reshape(-1, 3))
        sidx_c, slot_valid, outs, _, overflow = compact_payload(
            keep_cand, payload, cap
        )
        c_pose, c_vd, c_dists, c_z = outs[:4]
        vis = None if inside_fn is None else inside_fn(outs[4])
        sidx = take_rows(
            jnp.concatenate(
                [cand_pidx, jnp.array([n_pts], cand_pidx.dtype)]
            ),
            jnp.minimum(sidx_c, cand_pidx.shape[0]),
        )
        overflow = overflow | jnp.full((1,), seg_count > seg_cap)
        count = jnp.reshape(
            jnp.maximum(
                exact_count,
                (seg_count * seg + factor - 1) // factor,
            ),
            (1,),
        )
        return self._eval_finish(
            sidx, slot_valid, c_pose, c_vd, c_dists, c_z, n_pts,
            overflow, count, frame, novel_pose, n_rays, n_samples,
            precomposite, ray_counts=None, vis=vis,
        )

    def _eval_slab(self, wpts, viewdir, z_vals, frame, novel_pose,
                   precomposite, inside_fn=None):
        """Slab-prefilter eval render (the production fast path).

        Pass 0: occupied-supercell boxes of the distance volume (exact
        conservative — common.py occupied_supercell_boxes) + per-ray
        slab union spans; only segments whose z range overlaps the span
        become candidates. Pass 1b: conservative bf16 distance rows on
        the candidate stream. Point compaction sorts INDICES only; the
        winners' geometry is rebuilt from packed 32-byte per-ray rows
        (o, d, near, far) and an analytic z recompute — measured on v5e,
        the wide-payload gather through the compaction and the (z,
        dists) segment-row gathers cost 3-4x more than the sort itself
        (tools/bench_slab_ablation.py).

        REQUIRES (dispatch-gated by `analytic_z` in __call__):
          * wpts = ray_o + viewdir * z (renderer invariant), and
          * z_vals = near*(1-t) + far*t with t = linspace(0, 1, S)
            (core/sampling.py stratified_z_vals, eval path).
        The recomputed z/dists are then BIT-EXACT vs the dense path:
        identical expressions over identical values, with t values
        routed through one-hot HIGHEST-precision matmuls (exact: a
        single 1.0 product per output; the MXU's default f32 path
        rounds operands through bf16). End-to-end output still differs
        from the dense path by float-rounding noise (4e-5 max rgb
        delta measured on TPU): XLA may fuse the point rebuild's
        mul+add into an fma differently across the two programs.
        Exactness caveat on empty frames as in segment_prefilter.
        """
        from .common import (
            compact_indices,
            compact_segments,
            occupied_supercell_boxes,
            slab_segment_keep,
            slab_span,
        )

        n_rays, n_samples = z_vals.shape
        seg = self.slab_filter
        per_ray_segs = n_samples // seg
        n_pts = n_rays * n_samples
        n_segments = n_pts // seg
        cap = eval_capacity(n_pts, self.eval_keep_frac)
        seg_cap = eval_capacity(
            n_pts, min(1.0, _SLAB_SEG_FACTOR * self.eval_keep_frac)
        ) // seg

        # ray origins from the first sample; the rest of wpts is dead
        ray_o = wpts[:, 0, :] - viewdir * z_vals[:, 0:1]
        # same constant as stratified_z_vals; z_vals[:, 0/-1] ARE
        # near/far bitwise (t=0 and t=1 rows of the affine form)
        t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
        near, far = z_vals[:, 0:1], z_vals[:, -1:]

        # ---- pass 0: boxes + spans + segment keep -------------------
        lo, hi, box_overflow = occupied_supercell_boxes(
            frame["pbw"][..., 24], frame["pbounds"], self.norm_th,
            self.slab_supercell, self.slab_box_capacity,
        )
        pose_o = world_points_to_pose_points(ray_o, frame["R"], frame["Th"])
        pose_d = world_dirs_to_pose_dirs(viewdir, frame["R"])
        span_lo, span_hi = slab_span(pose_o, pose_d, lo, hi)
        keep = slab_segment_keep(span_lo, span_hi, z_vals, seg)
        # box-list overflow: the box set is not conservative — keep
        # every segment (the seg-capacity overflow then escalates the
        # engine ladder to a correct rung)
        keep = keep | box_overflow[0]
        seg_sidx, seg_valid, seg_count = compact_segments(
            keep, seg_cap, n_segments
        )

        # ---- candidate expansion: ONE packed ray-row gather ---------
        ray_pack = jnp.concatenate([ray_o, viewdir, near, far], axis=-1)
        ray_id = seg_sidx // per_ray_segs  # dead (n_segments) -> n_rays
        c_ray = ray_pack.at[ray_id].get(
            mode="fill", fill_value=0.0, indices_are_sorted=True
        )
        c_o, c_d = c_ray[:, :3], c_ray[:, 3:6]
        c_near, c_far = c_ray[:, 6:7], c_ray[:, 7:8]
        # exact t values of this segment's samples via one-hot matmul
        seg_onehot = (
            (seg_sidx % per_ray_segs)[:, None]
            == jnp.arange(per_ray_segs)[None, :]
        ).astype(jnp.float32)
        # HIGHEST precision: the TPU MXU's default f32 path rounds the
        # t operand through bf16 (measured 8.8e-3 rgb delta); the exact
        # multi-pass product keeps the 1.0-one-hot selection bit-exact
        t_seg = jnp.matmul(
            seg_onehot, t.reshape(per_ray_segs, seg),
            precision=jax.lax.Precision.HIGHEST,
        )  # (seg_cap, seg)
        c_z_seg = c_near * (1.0 - t_seg) + c_far * t_seg
        cand_w = c_o[:, None, :] + c_d[:, None, :] * c_z_seg[..., None]
        cand_pose = world_points_to_pose_points(
            cand_w.reshape(-1, 3), frame["R"], frame["Th"]
        )
        cand_valid = jnp.repeat(seg_valid, seg)

        # ---- pass 1b: conservative bf16 distance filter -------------
        dist_packed, th1 = self._conservative_dist_rows(frame)
        pnorm = pts_sample_blend_weights_packed(
            cand_pose, dist_packed, frame["pbounds"], n_channels=1
        )[..., 0].astype(jnp.float32)
        pnorm = jnp.where(cand_valid, pnorm, jnp.inf)
        keep_cand = keep_mask_with_argmin(pnorm, th1)
        cons_count = jnp.sum((pnorm < th1).astype(jnp.int32))

        # pre-truncation survivor counts per ray (for the composite's
        # exact end offsets): per-segment counts scattered back to the
        # dense segment grid (seg_cap rows — cheap), then reduced
        seg_counts = jnp.sum(
            keep_cand.reshape(seg_cap, seg).astype(jnp.int32), axis=-1
        )
        dense_counts = (
            jnp.zeros((n_segments + 1,), jnp.int32)
            .at[seg_sidx]
            .set(seg_counts, mode="drop", indices_are_sorted=True)
        )[:n_segments]
        ray_counts = dense_counts.reshape(n_rays, per_ray_segs).sum(-1)

        # ---- point compaction: indices only + winner rebuild --------
        idx, n_kept = compact_indices(keep_cand, cap)
        slot = jax.lax.broadcasted_iota(jnp.int32, (cap, 1), 0)[:, 0]
        slot_valid = slot < n_kept
        cidx = jnp.where(slot_valid, idx, seg_cap * seg)
        # original point index: candidate slot -> segment -> sample
        w_seg = jnp.concatenate(
            [seg_sidx, jnp.array([n_segments], seg_sidx.dtype)]
        ).at[cidx // seg].get(mode="fill", fill_value=n_segments)
        sidx = jnp.minimum(w_seg * seg + cidx % seg, n_pts)
        # winners' geometry from the packed ray rows + analytic z
        w_ray_id = jnp.where(slot_valid, sidx // n_samples, n_rays)
        w_ray = ray_pack.at[w_ray_id].get(
            mode="fill", fill_value=0.0, indices_are_sorted=True
        )
        w_o, w_d = w_ray[:, :3], w_ray[:, 3:6]
        w_near, w_far = w_ray[:, 6], w_ray[:, 7]
        j = sidx % n_samples
        # (S, 3) table of (t_j, t_{j1-1}, t_{j1}) with j1 = min(j+1, S-1);
        # dists_j = z(t_{j1}) - z(t_{j1-1}) reproduces z_vals_to_dists
        # incl. the repeated last interval
        ar = jnp.arange(n_samples)
        a1 = jnp.minimum(ar + 1, n_samples - 1)
        t_table = jnp.stack([t, t[a1 - 1], t[a1]], axis=-1)
        onehot = (j[:, None] == ar[None, :]).astype(jnp.float32)
        tt = jnp.matmul(
            onehot, t_table, precision=jax.lax.Precision.HIGHEST
        )  # (cap, 3), exact t values (see t_seg precision note)
        z_of = lambda tv: w_near * (1.0 - tv) + w_far * tv
        c_z = z_of(tt[:, 0])
        c_dists = z_of(tt[:, 2]) - z_of(tt[:, 1])
        c_world = w_o + w_d * c_z[:, None]  # == wpts rows (analytic_z)
        c_pose = world_points_to_pose_points(
            c_world, frame["R"], frame["Th"]
        )

        overflow = jnp.full(
            (1,), jnp.sum(keep_cand.astype(jnp.int32)) > cap
        ) | jnp.full((1,), seg_count > seg_cap)
        count = jnp.reshape(
            jnp.maximum(
                cons_count,
                (seg_count * seg + _SLAB_SEG_FACTOR - 1)
                // _SLAB_SEG_FACTOR,
            ),
            (1,),
        )
        vis = None
        if inside_fn is not None:
            vis = inside_fn(c_world)
        return self._eval_finish(
            sidx, slot_valid, c_pose, w_d, c_dists, c_z, n_pts,
            overflow, count, frame, novel_pose, n_rays, n_samples,
            precomposite, ray_counts=ray_counts, vis=vis,
        )

    def _eval_compacted(self, pose_pts, vd, dists, z_flat, frame,
                        novel_pose, n_rays, n_samples, precomposite,
                        inside_fn=None, wpts_flat=None):
        """Eval render with survivor compaction: pass 2 runs the full
        pipeline on the fixed-capacity compacted list from
        _compact_inputs. With `precomposite`, the maps are composited
        directly on the compacted stream (core/composite.py
        composite_compacted); otherwise raw scatters back densely.
        Equal to the masked full path while survivors fit capacity.
        """
        sidx, slot_valid, c_pose, c_vd, c_dists, c_z, n, overflow, pind = (
            self._compact_inputs(
                pose_pts, vd, dists, z_flat, frame, self.eval_keep_frac,
                conservative=True,
            )
        )
        vis = None
        if inside_fn is not None:
            # carve on the survivors only: gather the EXACT dense wpts
            # rows by the compaction indices (dead slots -> fill 0,
            # masked downstream by slot_valid)
            vis = inside_fn(take_rows(wpts_flat, sidx))
        return self._eval_finish(
            sidx, slot_valid, c_pose, c_vd, c_dists, c_z, n, overflow,
            survivor_count(pind), frame, novel_pose, n_rays, n_samples,
            precomposite,
            ray_counts=pind.reshape(n_rays, n_samples).sum(-1),
            vis=vis,
        )

    def _eval_finish(self, sidx, slot_valid, c_pose, c_vd, c_dists, c_z,
                     n, overflow, count, frame, novel_pose, n_rays,
                     n_samples, precomposite, ray_counts=None, vis=None):
        """Shared pass 2: full pipeline on the compacted survivor list.

        `vis` (cap,) bool: multi-view visibility of each slot, applied
        exactly like the dense renderer's raw * vis carve
        (tpose_renderer_mmsk.py:59-95)."""
        pbw_packed = pack_corner_volume(frame["pbw"])
        c_init_pbw = pts_sample_blend_weights_packed(
            c_pose, pbw_packed, frame["pbounds"],
            n_channels=frame["pbw"].shape[-1],
        )
        tpose, _ = self.pose_to_canonical(
            c_pose, c_init_pbw[..., :24], frame, novel_pose
        )
        sigma, rgb_logits = self.tpose_human(
            tpose, c_vd, frame["latent_index"]
        )
        sigma = jnp.where(inside_bounds(tpose, frame["tbounds"]), sigma, 0.0)
        # exact f32 re-check of the shell filter (pass 1 may be a
        # conservative superset: bf16 rows or the segment pre-filter);
        # the distance channel comes with the 25-ch gather already paid
        # for. Idempotent when pass 1 was exact.
        c_pnorm = jnp.where(slot_valid, c_init_pbw[..., 24], jnp.inf)
        exact_keep = keep_mask_with_argmin(c_pnorm, self.norm_th)
        sigma = jnp.where(exact_keep, sigma, 0.0)
        alpha = raw_alpha_from_sigma(sigma, c_dists)
        rgb = jax.nn.sigmoid(rgb_logits)
        if vis is not None:
            alpha = jnp.where(vis, alpha, 0.0)
            rgb = jnp.where(vis[:, None], rgb, 0.0)
        if precomposite:
            from ..core.composite import composite_compacted

            rgb_map, acc_map, depth_map = composite_compacted(
                sidx, slot_valid, rgb, alpha, c_z, n_rays, n_samples,
                ray_counts=ray_counts,
            )
            return {
                "rgb_map": rgb_map, "acc_map": acc_map,
                "depth_map": depth_map, "compact_overflow": overflow,
                "compact_count": count,
            }
        raw_c = jnp.concatenate([rgb, alpha[:, None]], axis=-1)
        return {
            "raw": scatter_compacted_raw(
                raw_c, slot_valid, sidx, n, n_rays, n_samples
            ),
            "compact_overflow": overflow,
            "compact_count": count,
        }

    def _train_compacted(self, pose_pts, vd, dists, z_flat, frame,
                         novel_pose, n_rays, n_samples):
        """Training forward with survivor compaction.

        Same selection as the dense path (pnorm < norm_th with forced
        argmin, tpose_nerf_network.py:149-157, via the shared
        _compact_inputs); the three MLP passes (bw field x2, canonical
        NeRF) run only on the compacted survivor list. raw scatters back
        dense for compositing; pbw/tbw/bw_mask stay compacted — the
        consistency loss is a masked mean, so the compacted stream with
        dead slots masked off computes the same value as the dense
        (R*S,) stream."""
        sidx, slot_valid, c_pose, c_vd, c_dists, _, n, overflow, _ = (
            self._compact_inputs(
                pose_pts, vd, dists, z_flat, frame, self.train_keep_frac
            )
        )

        c_init_pbw = jax.lax.stop_gradient(
            pts_sample_blend_weights_packed(
                c_pose, pack_corner_volume(frame["pbw"]), frame["pbounds"],
                n_channels=frame["pbw"].shape[-1],
            )
        )
        tpose, pbw = self.pose_to_canonical(
            c_pose, c_init_pbw[..., :24], frame, novel_pose
        )
        init_tbw = pts_sample_blend_weights_packed(
            tpose, pack_corner_volume(frame["tbw"]), frame["tbounds"],
            n_channels=frame["tbw"].shape[-1],
        )
        tbw = self.bw_field(
            tpose, init_tbw[..., :24], jnp.zeros_like(frame["latent_index"])
        )

        sigma, rgb_logits = self.tpose_human(tpose, c_vd, frame["latent_index"])
        sigma = jnp.where(inside_bounds(tpose, frame["tbounds"]), sigma, 0.0)
        alpha = raw_alpha_from_sigma(sigma, c_dists)
        raw_c = jnp.concatenate(
            [jax.nn.sigmoid(rgb_logits), alpha[:, None]], axis=-1
        )
        raw = scatter_compacted_raw(
            raw_c, slot_valid, sidx, n, n_rays, n_samples
        )

        # consistency selection on the compacted stream: dead slots are
        # -inf exactly like dense-filtered points, and compaction is
        # stable, so the forced argmax picks the same point
        d_sel = jax.lax.stop_gradient(
            jnp.where(slot_valid, sigma, -jnp.inf)
        )
        bw_mask = (d_sel > self.train_th) | jax.nn.one_hot(
            jnp.argmax(d_sel), d_sel.shape[-1], dtype=bool
        )
        return {
            "raw": raw,
            "pbw": pbw,
            "tbw": tbw,
            "bw_mask": bw_mask & slot_valid,
            "compact_overflow": overflow,
        }

    def __call__(self, wpts, viewdir, z_vals, frame, train: bool = True,
                 novel_pose: bool = False, precomposite: bool = False,
                 analytic_z: bool = False, inside_fn=None):
        """wpts (R,S,3), viewdir (R,3), z_vals (R,S) -> dict.

        Mirrors tpose_nerf_network.py:139-215 with masked compute:
        filtered points produce raw == 0 exactly.

        `analytic_z`: promise that z_vals is the unperturbed stratified
        eval grid (z = near*(1-t) + far*t, t = linspace) AND wpts lies
        on the rays — set by render_rays on the eval path; it gates the
        slab pre-filter, whose winner rebuild recomputes z analytically.

        `inside_fn` (eval compacted paths only): multi-view visibility
        carve evaluated ON THE COMPACTED SURVIVOR STREAM instead of on
        every dense sample — the carve's per-point mask gathers are the
        dominant novel-view cost (measured 3.9 s vs 0.16 s plain at
        whole-frame scale with 20 views; render/renderer.py).
        """
        n_rays, n_samples = z_vals.shape
        if not train and self.eval_keep_frac > 0:
            if (
                analytic_z and self.slab_filter > 1
                and n_samples % self.slab_filter == 0
            ):
                return self._eval_slab(
                    wpts, viewdir, z_vals, frame, novel_pose, precomposite,
                    inside_fn=inside_fn,
                )
            if self.seg_filter > 1 and n_samples % self.seg_filter == 0:
                # hierarchical paths never materialize the dense point set
                return self._eval_compacted_hier(
                    wpts, viewdir, z_vals, frame, novel_pose, precomposite,
                    inside_fn=inside_fn,
                )
        pts = wpts.reshape(-1, 3)
        vd = broadcast_viewdirs(viewdir, n_samples)
        dists = z_vals_to_dists(z_vals).reshape(-1)

        # world -> posed SMPL space
        pose_pts = world_points_to_pose_points(pts, frame["R"], frame["Th"])

        if not train and self.eval_keep_frac > 0:
            return self._eval_compacted(
                pose_pts, vd, dists, z_vals.reshape(-1), frame,
                novel_pose, n_rays, n_samples, precomposite,
                inside_fn=inside_fn, wpts_flat=pts,
            )
        if train and self.train_keep_frac > 0:
            return self._train_compacted(
                pose_pts, vd, dists, z_vals.reshape(-1), frame, novel_pose,
                n_rays, n_samples
            )

        # point filter from the precomputed distance channel (:149-157).
        # The grid lookup runs over the corner-packed layout: one gather
        # row per point instead of 8 (the gather is the #1 cost of the
        # whole render step on TPU — see core/grid.py).
        pbw_packed = pack_corner_volume(frame["pbw"])
        init_pbw = jax.lax.stop_gradient(
            pts_sample_blend_weights_packed(
                pose_pts, pbw_packed, frame["pbounds"],
                n_channels=frame["pbw"].shape[-1],
            )
        )
        pnorm = init_pbw[..., 24]
        pind = keep_mask_with_argmin(pnorm, self.norm_th)

        # masked-out points never reach the warp in the reference
        # (boolean gather, tpose_nerf_network.py:149-163); substitute a
        # benign in-body point + its grid prior so a drifted bw softmax
        # at far points can't blend a singular LBS transform
        # (models/common.py substitute_masked)
        safe = (frame["pbounds"][0] + frame["pbounds"][1]) * 0.5
        safe_bw = pts_sample_blend_weights_packed(
            safe[None], pbw_packed, frame["pbounds"],
            n_channels=frame["pbw"].shape[-1],
        )
        pose_pts = substitute_masked(pose_pts, pind, safe)
        init_pbw = jnp.where(pind[:, None], init_pbw, safe_bw[0])

        # neural blend weights + backward LBS warp (:164)
        tpose, pbw = self.pose_to_canonical(
            pose_pts, init_pbw[..., :24], frame, novel_pose
        )

        # canonical-space neural blend weights (consistency target,
        # :169-174). Only the TRAINING loss consumes tbw/bw_mask
        # (tpose_trainer.py:50-53) — the eval render skips the second
        # trilerp + second bw-MLP pass entirely.
        if train:
            init_tbw = pts_sample_blend_weights_packed(
                tpose, pack_corner_volume(frame["tbw"]), frame["tbounds"],
                n_channels=frame["tbw"].shape[-1],
            )
            tbw = self.bw_field(
                tpose, init_tbw[..., :24], jnp.zeros_like(frame["latent_index"])
            )

        # canonical NeRF (:179-181); world-space view dirs, per reference
        sigma, rgb_logits = self.tpose_human(tpose, vd, frame["latent_index"])

        # canonical bbox filter (:186-190)
        inside = inside_bounds(tpose, frame["tbounds"])
        sigma = jnp.where(inside, sigma, 0.0)

        # raw assembly (:201-212); masked points contribute exactly 0
        alpha = raw_alpha_from_sigma(sigma, dists)
        rgb = jax.nn.sigmoid(rgb_logits)
        raw = jnp.concatenate([rgb, alpha[:, None]], axis=-1)
        raw = jnp.where(pind[:, None], raw, 0.0)

        out = {"raw": raw.reshape(n_rays, n_samples, 4)}
        if train:
            # blend-weight consistency selection (:192-196): density above
            # train_th, with the global argmax forced on
            d_sel = jax.lax.stop_gradient(jnp.where(pind, sigma, -jnp.inf))
            bw_mask = (d_sel > self.train_th) | jax.nn.one_hot(
                jnp.argmax(d_sel), d_sel.shape[-1], dtype=bool
            )
            out.update({"pbw": pbw, "tbw": tbw, "bw_mask": bw_mask})
        return out
