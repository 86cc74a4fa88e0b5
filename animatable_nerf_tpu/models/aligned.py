"""The extension's "aligned" re-implementations and ablations — all use
KNN blend-weight lookups over SMPL vertices and the softplus canonical
NeRF + no-normals color head:

  * AlignedLBW    — learned blend-weight field (frame latent)
                    (lib/networks/bw_deform/aligned_aninerf_lbw_network.py)
  * AlignedPBW    — bw field conditioned on the pose vector
                    (aligned_aninerf_pbw_network.py)
  * AlignedSMPL   — raw SMPL weights, no learned deformation
                    (aligned_aninerf_smpl_network.py)
  * AlignedLBWPDF — learned blend weights AND displacement field
                    (aligned_aninerf_lbw_pdf_network.py)

Frame dict keys: R, Th, A, big_A, poses (72,), weights (6890,24),
pvertices, tvertices (6890,3), tbounds, latent_index, bw_latent_index.
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
    pose_dirs_to_tpose_dirs,
    tpose_dirs_to_pose_dirs,
    sample_blend_closest_points,
)
from ..core.encoding import positional_encoding
from ..core.sampling import z_vals_to_dists
from ..fields import (
    BlendWeightField,
    ResidualField,
    GeometricFieldNetwork,
    ColorNetwork,
)
from ..fields.mlp import SkipMLP
from .common import (
    keep_mask_with_argmin,
    inside_bounds,
    broadcast_viewdirs,
    raw_alpha_from_sigma,
    substitute_masked,
)


class PoseCondBWField(nn.Module):
    """Blend-weight field conditioned on the 72-d pose vector instead of a
    frame latent (aligned_aninerf_pbw_network.py:45-60; input_ch = 135)."""

    xyz_res: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, smpl_bw, pose_vec):
        pe = positional_encoding(pts, self.xyz_res)
        pose = jnp.broadcast_to(pose_vec, (*pe.shape[:-1], pose_vec.shape[-1]))
        feat = jnp.concatenate([pe, pose], axis=-1)
        logits = SkipMLP(
            depth=8, width=256, out_dim=24, name="mlp", dtype=self.dtype
        )(feat)
        return jax.nn.softmax(jnp.log(smpl_bw + 1e-9) + logits, axis=-1)


class _AlignedBase(nn.Module):
    """Shared plumbing: KNN filter, canonical head, masked raw assembly."""

    # engine gate: see models/pdf.py _PDFBase.knn_pass1
    knn_pass1 = True

    num_latents: int
    num_eval_frames: int = 0
    norm_th: float = 0.05
    train_th: float = 0.0
    tpose_viewdir: bool = True
    xyz_res: int = 10
    # eval-time survivor compaction (models/aninerf.py); the deform
    # variants re-run their KNN on the small compacted set
    eval_keep_frac: float = 0.25
    # train-time survivor compaction (see models/pdf.py): the KNN filter
    # pass stays dense; the warp and canonical MLPs (forward AND
    # backward) run on the compacted in-shell points. Loss/grads equal
    # the dense masked path while survivors fit capacity. 0 disables.
    train_keep_frac: float = 0.0
    # MLP compute dtype (see models/pdf.py _PDFBase.dtype: params,
    # geometry, KNN, filtering and compositing stay f32); selected by
    # the `compute_dtype` config key through models/registry.make_model
    dtype: Any = jnp.float32

    def _canonical_head(self):
        self.nerf_network = GeometricFieldNetwork(dtype=self.dtype)
        self.color_network = ColorNetwork(
            num_latents=self.num_latents, use_normals=False,
            dtype=self.dtype,
        )

    def _knn_bw(self, pts, ref, frame):
        bw, dist = sample_blend_closest_points(pts, ref, frame["weights"])
        return bw, dist[..., 0]

    def _warp_both(self, pose_pts, pose_dirs, pbw, frame):
        """Fused posed -> T-pose -> big-pose warp for points and dirs
        (core/lbs.py backward_warp_points_dirs: shared blends/inverse,
        bit-identical to the reference's separate calls)."""
        from ..core import backward_warp_points_dirs

        dirs_in = (
            pose_dirs if (self.tpose_viewdir and pose_dirs is not None)
            else None
        )
        return backward_warp_points_dirs(
            pose_pts, dirs_in, pbw, frame["A"], frame["big_A"]
        )

    def _filter(self, pose_pts, frame, th):
        _, pnorm = jax.lax.stop_gradient(
            sample_blend_closest_points(pose_pts, frame["pvertices"], frame["weights"])
        )
        return keep_mask_with_argmin(pnorm[..., 0], th)

    def _filter_th(self):
        """Forward-path filter threshold. LBW/PBW read the configured
        norm_th (aligned_aninerf_lbw_network.py:100); SMPL and LBWPDF
        hard-code 0.1 in the reference forwards
        (aligned_aninerf_smpl_network.py:70,
        aligned_aninerf_lbw_pdf_network.py:138) — pinned by the golden
        oracle tests."""
        if isinstance(self, (AlignedSMPL, AlignedLBWPDF)):
            return 0.1
        return self.norm_th

    def _head(self, tpose, dirs, dists, frame):
        """Softplus NeRF density + color (aligned_aninerf_pdf_network.py:
        177-201)."""
        out = self.nerf_network(tpose)
        sigma, feat = out[..., 0], out[..., 1:]
        alpha = raw_alpha_from_sigma(sigma, dists)
        rgb = self.color_network(tpose, None, dirs, feat, frame["latent_index"])
        return jnp.concatenate([rgb, alpha[:, None]], axis=-1)

    def density(self, wpts, frame):
        """World -> canonical density for mesh extraction."""
        pose_pts = world_points_to_pose_points(wpts, frame["R"], frame["Th"])
        pind = self._filter(pose_pts, frame, 0.1)
        tpose = self._deform(pose_pts, None, frame)[0]
        sigma = self.nerf_network(tpose)[..., 0]
        return jnp.where(pind, sigma, 0.0)

    def _finish(self, raw, tpose, pind, frame, n_rays, n_samples):
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        raw = jnp.where((pind & inside)[:, None], raw, 0.0)
        return raw.reshape(n_rays, n_samples, 4)

    # ------------------------------------------------------- stage 2
    def _anim_select(self, sigma, keep):
        """Density-above-threshold selection with forced argmax
        (aninerf_sample_animation_trainer.py:113-121)."""
        d = jax.lax.stop_gradient(jnp.where(keep, sigma, -jnp.inf))
        return (d > self.train_th) | jax.nn.one_hot(
            jnp.argmax(d), d.shape[-1], dtype=bool
        )

    def animation_from_pose(self, pose_pts, frame):
        """Stage-2 consistency pair sampled in observation space
        (aninerf_sample_animation_trainer.py:51-88 `ppts_to_tpose`):
        KNN-prior novel-pose bw -> warp to canonical -> canonical bw,
        selection by in-bounds AND in-shell density (the reference also
        requires the OBSERVATION-space KNN distance under norm_th,
        aninerf_sample_animation_trainer.py:77-80 — caught by the
        golden loss test)."""
        init_pbw, pnorm = self._knn_bw(pose_pts, frame["pvertices"], frame)
        pbw = self.novel_pose_bw(
            pose_pts, init_pbw, frame["bw_latent_index"]
        )
        tpose = pose_points_to_tpose_points(pose_pts, pbw, frame["A"])
        tpose = tpose_points_to_pose_points(tpose, pbw, frame["big_A"])
        init_tbw, _ = self._knn_bw(tpose, frame["tvertices"], frame)
        tbw = self._canonical_bw(tpose, init_tbw, frame)
        sigma = self.nerf_network(tpose)[..., 0]
        keep = inside_bounds(tpose, frame["tbounds"]) & (pnorm < self.norm_th)
        sigma = jnp.where(keep, sigma, 0.0)
        return pbw, tbw, self._anim_select(sigma, keep)

    def animation_from_canonical(self, tpts, frame):
        """Stage-2 pair sampled in canonical space
        (aninerf_sample_animation_trainer.py:91-121 `tpose_to_ppts`):
        canonical bw -> forward warp -> novel-pose bw, selection by
        KNN-distance-filtered density."""
        init_tbw, tnorm = self._knn_bw(tpts, frame["tvertices"], frame)
        tbw = self._canonical_bw(tpts, init_tbw, frame)
        sigma = self.nerf_network(tpts)[..., 0]
        t = pose_points_to_tpose_points(tpts, tbw, frame["big_A"])
        ppts = tpose_points_to_pose_points(t, tbw, frame["A"])
        init_pbw, _ = self._knn_bw(ppts, frame["pvertices"], frame)
        pbw = self.novel_pose_bw(ppts, init_pbw, frame["bw_latent_index"])
        keep = tnorm < self.norm_th
        sigma = jnp.where(keep, sigma, 0.0)
        return pbw, tbw, self._anim_select(sigma, keep)

    def _bw_mask(self, raw_flat, pind):
        """Select points for the bw consistency loss from the FINAL alpha
        (aligned_aninerf_lbw_network.py:137-144)."""
        a_sel = jax.lax.stop_gradient(
            jnp.where(pind, raw_flat[:, 3], -jnp.inf)
        )
        return (a_sel > self.train_th) | jax.nn.one_hot(
            jnp.argmax(a_sel), a_sel.shape[-1], dtype=bool
        )

    def _compact_inputs(self, pose_pts, vd, dists, z_flat, frame,
                        keep_frac, conservative: bool = False,
                        cap_widen: float = 1.0):
        """Pass 1 shared by the eval AND train compacted paths: fused
        Pallas KNN distance filter (no (N, 6890) distance-matrix
        materialization; data-only, so stop_gradient is a no-op the
        training grad never crosses) + fixed-capacity compaction.

        `conservative` (eval): the per-frame packed distance grid (when
        the engine attached one) or the min-distance-only kernel
        replaces the full KNN in pass 1 (both lower-bound the
        IDW-weighted filter distance; see models/pdf.py
        _compact_inputs) — the eval path already runs the full KNN on
        the compacted set for the blend-weight prior and re-applies the
        exact filter there. `cap_widen` scales the capacity (train
        callers widen it for the conservative superset; the eval ladder
        handles widening by escalation instead)."""
        from .common import compact_payload, eval_capacity, grid_pdist_keep
        from ..ops.knn_pallas import (
            sample_blend_closest_points_fused, nearest_distance_fused,
        )

        cap = eval_capacity(
            pose_pts.shape[0], min(keep_frac * cap_widen, 1.0)
        )
        th = self._filter_th()
        if conservative and "pdist_packed" in frame:
            pind = grid_pdist_keep(pose_pts, frame, th)
        else:
            if conservative:
                pn = jax.lax.stop_gradient(
                    nearest_distance_fused(pose_pts, frame["pvertices"])
                )
            else:
                pn = jax.lax.stop_gradient(
                    sample_blend_closest_points_fused(
                        pose_pts, frame["pvertices"], frame["weights"]
                    )[1]
                )[..., 0]
            pind = keep_mask_with_argmin(pn, th)
        sidx, slot_valid, (c_pose, c_vd, c_dists, c_z), n, overflow = (
            compact_payload(pind, [pose_pts, vd, dists, z_flat], cap)
        )
        return (sidx, slot_valid, c_pose, c_vd, c_dists, c_z, n,
                overflow, pind)

    def _compact_knn_prior(self, c_pose, frame):
        """KNN blend-weight prior + weighted distance on the small
        compacted set (fused kernel; data-only)."""
        from ..ops.knn_pallas import sample_blend_closest_points_fused

        from .common import knn_blend_for_frame

        return jax.lax.stop_gradient(knn_blend_for_frame(c_pose, frame))

    def _eval_compacted(self, pose_pts, vd, dists, z_flat, frame,
                        novel_pose, n_rays, n_samples, precomposite,
                        inside_fn=None, wpts_flat=None):
        """Survivor-compacted eval render (see models/aninerf.py)."""
        from .common import scatter_compacted_raw, survivor_count, take_rows

        sidx, slot_valid, c_pose, c_vd, c_dists, c_z, n, overflow, pind = (
            self._compact_inputs(
                pose_pts, vd, dists, z_flat, frame, self.eval_keep_frac,
                conservative=True,
            )
        )
        c_pose_dirs = world_dirs_to_pose_dirs(c_vd, frame["R"])
        c_init_pbw, c_pnorm = self._compact_knn_prior(c_pose, frame)
        tpose, tdirs, _ = self._deform(
            c_pose, c_pose_dirs, frame, novel_pose=novel_pose,
            init_pbw=c_init_pbw,
        )
        dirs = tdirs if self.tpose_viewdir else c_vd
        raw_c = self._head(tpose, dirs, c_dists, frame)
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        # exact weighted-distance filter on the stream (pass 1 was the
        # conservative min-distance superset)
        th = self._filter_th()
        c_keep = keep_mask_with_argmin(
            jnp.where(slot_valid, c_pnorm[..., 0], jnp.inf), th
        )
        if inside_fn is not None:
            # multi-view visibility carve on the survivors only (see
            # models/aninerf.py __call__)
            c_keep = c_keep & inside_fn(take_rows(wpts_flat, sidx))
        raw_c = jnp.where((inside & c_keep)[:, None], raw_c, 0.0)
        if precomposite:
            from ..core.composite import composite_compacted

            rgb_map, acc_map, depth_map = composite_compacted(
                sidx, slot_valid, raw_c[:, :3], raw_c[:, 3], c_z,
                n_rays, n_samples,
                ray_counts=pind.reshape(n_rays, n_samples).sum(-1),
            )
            return {
                "rgb_map": rgb_map, "acc_map": acc_map,
                "depth_map": depth_map, "compact_overflow": overflow,
                "compact_count": survivor_count(pind),
            }
        return {
            "raw": scatter_compacted_raw(
                raw_c, slot_valid, sidx, n, n_rays, n_samples
            ),
            "compact_overflow": overflow,
            "compact_count": survivor_count(pind),
        }

    def _train_compacted(self, pose_pts, vd, dists, z_flat, frame,
                         novel_pose, n_rays, n_samples):
        """Training forward with survivor compaction (see models/pdf.py).

        The bw-consistency pair (pbw/tbw) stays on the compacted stream;
        its selection mask comes from the final alpha exactly like the
        dense `_bw_mask` (aligned_aninerf_lbw_network.py:137-144). The
        tbw KNN prior runs the differentiable XLA twin — tpose depends on
        the params, and the compacted set is small."""
        from .common import scatter_compacted_raw

        # grid pass-1 when the frame store carries the packed distance
        # grid: pass 1 becomes a conservative superset, and the exact
        # weighted filter is re-applied from the KNN prior this path
        # already runs on the survivors (see models/pdf.py
        # _train_compacted for the mask contract)
        conservative = "pdist_packed" in frame
        sidx, sv, c_pose, c_vd, c_dists, _, n, ovf, _ = (
            self._compact_inputs(
                pose_pts, vd, dists, z_flat, frame, self.train_keep_frac,
                conservative=conservative,
                # the conservative superset keeps ~1.25x the exact set
                # (measured; margin-widened shell) — widen the TRAIN
                # capacity so configs tuned for the exact filter don't
                # silently overflow (eval escalates its ladder instead)
                cap_widen=1.3 if conservative else 1.0,
            )
        )
        c_pose_dirs = world_dirs_to_pose_dirs(c_vd, frame["R"])
        c_init_pbw, c_pnorm = self._compact_knn_prior(c_pose, frame)
        surv = sv
        if conservative:
            th = self._filter_th()
            surv = sv & keep_mask_with_argmin(
                jnp.where(sv, c_pnorm[..., 0], jnp.inf), th
            )
        tpose, tdirs, extras = self._deform(
            c_pose, c_pose_dirs, frame, novel_pose=novel_pose,
            init_pbw=c_init_pbw,
        )
        dirs = tdirs if self.tpose_viewdir else c_vd
        raw_c = self._head(tpose, dirs, c_dists, frame)
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        raw_c = jnp.where((surv & inside)[:, None], raw_c, 0.0)

        out = {
            "raw": scatter_compacted_raw(
                raw_c, sv, sidx, n, n_rays, n_samples
            ),
            "compact_overflow": ovf,
        }
        if "pbw" in extras:
            init_tbw, _ = self._knn_bw(tpose, frame["tvertices"], frame)
            tbw = self._canonical_bw(tpose, init_tbw, frame)
            out.update(
                pbw=extras["pbw"], tbw=tbw,
                bw_mask=self._bw_mask(raw_c, surv),
            )
        if "resd" in extras:
            out.update(resd=extras["resd"], resd_mask=surv)
        return out

    def __call__(self, wpts, viewdir, z_vals, frame, train: bool = True,
                 novel_pose: bool = False, precomposite: bool = False,
                 analytic_z: bool = False, inside_fn=None):
        n_rays, n_samples = z_vals.shape
        pts = wpts.reshape(-1, 3)
        vd = broadcast_viewdirs(viewdir, n_samples)
        dists = z_vals_to_dists(z_vals).reshape(-1)

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

        pose_dirs = world_dirs_to_pose_dirs(vd, frame["R"])
        pind = self._filter(pose_pts, frame, self._filter_th())
        # masked-out points never reach the warp in the reference
        # (boolean gather); keep them off the singular-blend hazard here
        # too (models/common.py substitute_masked)
        pose_pts = substitute_masked(pose_pts, pind, frame["pvertices"][0])

        tpose, tpose_dirs, extras = self._deform(
            pose_pts, pose_dirs, frame, novel_pose=novel_pose
        )
        dirs = tpose_dirs if self.tpose_viewdir else vd

        raw = self._head(tpose, dirs, dists, frame)
        out = {"raw": self._finish(raw, tpose, pind, frame, n_rays, n_samples)}
        raw_flat = out["raw"].reshape(-1, 4)

        if "pbw" in extras:
            # canonical-space neural bw consistency target
            init_tbw, _ = self._knn_bw(tpose, frame["tvertices"], frame)
            tbw = self._canonical_bw(tpose, init_tbw, frame)
            out.update(
                pbw=extras["pbw"], tbw=tbw, bw_mask=self._bw_mask(raw_flat, pind)
            )
        if "resd" in extras:
            out.update(resd=extras["resd"], resd_mask=pind)
        return out


class AlignedLBW(_AlignedBase):
    """Learned blend-weight field with frame latents + optional stage-2
    novel-pose field."""

    def setup(self):
        self.bw_field = BlendWeightField(
            num_latents=self.num_latents + 1, xyz_res=self.xyz_res,
            dtype=self.dtype,
        )
        if self.num_eval_frames > 0:
            self.novel_pose_bw = BlendWeightField(
                num_latents=self.num_eval_frames, xyz_res=self.xyz_res,
                dtype=self.dtype,
            )
        self._canonical_head()

    def _deform(self, pose_pts, pose_dirs, frame, novel_pose: bool = False,
                init_pbw=None):
        if init_pbw is None:
            init_pbw, _ = self._knn_bw(pose_pts, frame["pvertices"], frame)
        if novel_pose:
            pbw = self.novel_pose_bw(pose_pts, init_pbw, frame["bw_latent_index"])
        else:
            pbw = self.bw_field(pose_pts, init_pbw, frame["latent_index"] + 1)
        tpose, dirs = self._warp_both(pose_pts, pose_dirs, pbw, frame)
        return tpose, dirs, {"pbw": pbw}

    def _canonical_bw(self, tpose, init_tbw, frame):
        return self.bw_field(tpose, init_tbw, jnp.zeros_like(frame["latent_index"]))


class AlignedPBW(AlignedLBW):
    """Pose-vector-conditioned blend-weight field (ablation).

    No novel-pose (stage-2) field: the reference PBW class references
    `self.novel_pose_bw` (aligned_aninerf_pbw_network.py:165-167) but
    never constructs it, so its stage-2 path is unreachable there too.
    """

    def setup(self):
        self.bw_field = PoseCondBWField(xyz_res=self.xyz_res, dtype=self.dtype)
        self._canonical_head()

    def _deform(self, pose_pts, pose_dirs, frame, novel_pose: bool = False,
                init_pbw=None):
        if init_pbw is None:
            init_pbw, _ = self._knn_bw(pose_pts, frame["pvertices"], frame)
        pbw = self.bw_field(pose_pts, init_pbw, frame["poses"])
        tpose, dirs = self._warp_both(pose_pts, pose_dirs, pbw, frame)
        return tpose, dirs, {"pbw": pbw}

    def _canonical_bw(self, tpose, init_tbw, frame):
        return self.bw_field(tpose, init_tbw, jnp.zeros_like(frame["poses"]))


class AlignedSMPL(_AlignedBase):
    """Pure SMPL-weight warp, no learned deformation (ablation);
    norm_th hard-coded to 0.1 (aligned_aninerf_smpl_network.py:71, via
    _filter_th)."""

    def setup(self):
        self._canonical_head()

    def _deform(self, pose_pts, pose_dirs, frame, novel_pose: bool = False,
                init_pbw=None):
        pbw = init_pbw
        if pbw is None:
            pbw, _ = self._knn_bw(pose_pts, frame["pvertices"], frame)
        tpose, dirs = self._warp_both(pose_pts, pose_dirs, pbw, frame)
        return tpose, dirs, {}


class AlignedLBWPDF(AlignedLBW):
    """Learned blend weights AND a residual displacement field (ablation,
    aligned_aninerf_lbw_pdf_network.py:89-121).

    Unlike LBW/PBW (which read cfg.norm_th), the reference LBWPDF
    forward hard-codes its point filter at 0.1
    (aligned_aninerf_lbw_pdf_network.py:138, via _filter_th) — pinned
    by the golden oracle test; the configured norm_th is deliberately
    ignored here."""

    def setup(self):
        self.bw_field = BlendWeightField(
            num_latents=self.num_latents + 1, xyz_res=self.xyz_res,
            dtype=self.dtype,
        )
        if self.num_eval_frames > 0:
            self.novel_pose_bw = BlendWeightField(
                num_latents=self.num_eval_frames, xyz_res=self.xyz_res,
                dtype=self.dtype,
            )
        self.resd_field = ResidualField(xyz_res=self.xyz_res, dtype=self.dtype)
        self._canonical_head()

    def _deform(self, pose_pts, pose_dirs, frame, novel_pose: bool = False,
                init_pbw=None):
        if init_pbw is None:
            init_pbw, _ = self._knn_bw(pose_pts, frame["pvertices"], frame)
        if novel_pose:
            pbw = self.novel_pose_bw(pose_pts, init_pbw, frame["bw_latent_index"])
        else:
            pbw = self.bw_field(pose_pts, init_pbw, frame["latent_index"] + 1)
        init_bigpose, dirs = self._warp_both(pose_pts, pose_dirs, pbw, frame)
        resd = self.resd_field(init_bigpose, frame["poses"])
        tpose = init_bigpose + resd
        return tpose, dirs, {"pbw": pbw, "resd": resd}
