"""Pose-dependent displacement-field (PDF) model family:

  * NeRFPDF — displacement field + softplus canonical NeRF
    (lib/networks/bw_deform/aligned_aninerf_pdf_network.py)
  * SDFPDF  — displacement field + VolSDF canonical surface
    (lib/networks/bw_deform/anisdf_pdf_network.py) — the flagship
    extension model
  * NeuSPDF — NeuS-style opacity instead of VolSDF
    (lib/networks/bw_deform/anisdf_neus_pdf_network.py)

All share the warp: raw-SMPL-weight backward LBS (KNN over the 6890
vertices) to T-pose, forward LBS to the canonical "big pose", then a
learned residual displacement. SDF normals and eikonal terms use
jax.grad instead of torch.autograd double-backward.

Expected `frame` keys (tpose_pdf_dataset.py:280-292): R, Th, A, big_A,
poses (72,), weights (6890,24), pvertices (6890,3), tbounds (2,3),
latent_index, bw_latent_index.
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
    backward_warp_points_dirs,
    sample_blend_closest_points,
)
from ..core.sampling import z_vals_to_dists
from ..core.sdf import volsdf_sigma, sigma_to_alpha, neus_alpha
from ..fields import (
    ResidualField,
    GeometricFieldNetwork,
    ColorNetwork,
    BetaNetwork,
    SingleVarianceNetwork,
)
from .common import (
    keep_mask_with_argmin,
    grid_pdist_keep,
    knn_blend_for_frame,
    inside_bounds,
    broadcast_viewdirs,
    raw_alpha_from_sigma,
    compact_payload,
    scatter_compacted_raw,
    eval_capacity,
    stage2_capacity,
    survivor_count,
    substitute_masked,
)

NORM_TH = 0.1  # hard-coded in the pdf models (anisdf_pdf_network.py:172)


class _PDFBase(nn.Module):
    """Shared displacement-field deformation."""

    # engine gate: eval pass-1 filters by KNN distance, so a per-frame
    # packed distance grid (ops/knn_pallas.py build_pdist_payload)
    # accelerates it when attached to the frame dict
    knn_pass1 = True

    num_latents: int
    tpose_viewdir: bool = True
    xyz_res: int = 10
    # eval-time survivor compaction (see models/aninerf.py): here the
    # savings are larger still — SDF eval runs per-point autograd
    # normals on top of the MLPs. Exact while survivors fit capacity.
    eval_keep_frac: float = 0.25
    # train-time survivor compaction: the displacement/SDF/color MLPs
    # and their backward passes run only on in-shell points (the KNN
    # filter pass stays dense — it IS pass 1). Loss and grads equal the
    # dense masked path while survivors fit capacity; overflow is
    # surfaced in the compact_overflow stat. NeuSPDF scatters the scalar
    # sdf/rgb back densely for its ray-ordered alpha
    # (_train_compacted_neus). 0 disables.
    train_keep_frac: float = 0.0
    # MLP compute dtype (params, geometry, KNN, filtering, compositing
    # stay f32). bf16 is the eval fast-variant: the resd/sdf/color
    # trunks' inter-layer activations are the HBM bound; normals come
    # from jax.grad THROUGH the bf16 trunk and are cast back to f32.
    # bench.py quality-guards the variant against the f32 render.
    dtype: Any = jnp.float32
    # eval stage-2 compaction: after the exact weighted-distance filter
    # (and the visibility carve) are known, re-compact the stream to
    # stage2_ratio * pass-1 capacity so the trunks run without the
    # conservative margin's dead slots. Exact (overflow escalates the
    # engine ladder); 0 disables. The representative scene's exact keep
    # is ~0.76x the conservative pass-1 keep; 0.85 leaves ~12% headroom.
    stage2_ratio: float = 0.85

    def _warp(self, pose_pts, pose_dirs, frame, pbw=None):
        """posed SMPL -> canonical big pose (+ residual displacement).

        Reference: aligned_aninerf_pdf_network.py:66-93 /
        anisdf_pdf_network.py:75-107. `pbw` may be precomputed to reuse
        the filter's KNN result (the KNN otherwise runs twice per
        forward, as in the reference).
        Returns (tpose, tpose_dirs, init_bigpose, resd).
        """
        if pbw is None:
            pbw, _ = sample_blend_closest_points(
                pose_pts, frame["pvertices"], frame["weights"]
            )
        # fused two-stage warp: the blended transforms and the 3x3
        # inverse are shared between the point and dir paths
        # (bit-identical to the reference's four separate blends —
        # core/lbs.py backward_warp_points_dirs)
        dirs_in = (
            pose_dirs if (self.tpose_viewdir and pose_dirs is not None)
            else None
        )
        init_bigpose, tpose_dirs = backward_warp_points_dirs(
            pose_pts, dirs_in, pbw, frame["A"], frame["big_A"]
        )
        resd = self.resd_field(init_bigpose, frame["poses"])
        tpose = init_bigpose + resd
        return tpose, tpose_dirs, init_bigpose, resd

    def _filter(self, pose_pts, frame):
        """KNN distance filter (anisdf_pdf_network.py:168-177)."""
        _, pnorm = jax.lax.stop_gradient(
            sample_blend_closest_points(pose_pts, frame["pvertices"], frame["weights"])
        )
        return keep_mask_with_argmin(pnorm[..., 0], NORM_TH)

    def _compact_inputs(self, pose_pts, vd, dists, z_flat, frame,
                        keep_frac, conservative: bool = False,
                        cap_widen: float = 1.0):
        """One KNN pass over all points -> filter -> fixed-capacity
        survivor compaction. Returns (sidx, slot_valid, compacted
        pose_pts / WORLD viewdirs / dists / z / pbw, n, overflow, pind,
        c_keep) where sidx routes dead slots to the sorted sentinel
        row n.

        `conservative` (eval path): pass 1 runs on the per-frame packed
        distance grid when the engine attached one (`pdist_packed` —
        ops/knn_pallas.py build_pdist_payload; one 16-byte gather/point
        instead of a 6890-vertex sweep) and otherwise the
        min-distance-only Pallas kernel — the k-selection loop and
        one-hot value matmuls of the full KNN are ~2/3 of its time.
        Both are certified lower bounds of the IDW-weighted filter
        distance, so {weighted < th} is a subset of the pass-1 keep.
        The full KNN then runs only on the compacted survivors and
        `c_keep` carries the EXACT weighted-distance filter for the
        callers to re-apply (None on the exact dense pass). All KNN
        outputs are data-only (no param dependence), so the training
        grad never crosses them. `cap_widen` scales the capacity (train
        callers widen it for the conservative superset; the eval ladder
        handles widening by escalation instead).
        """
        from ..ops.knn_pallas import (
            sample_blend_closest_points_fused, nearest_distance_fused,
        )

        cap = eval_capacity(
            pose_pts.shape[0], min(keep_frac * cap_widen, 1.0)
        )
        c_keep = None
        if conservative:
            if "pdist_packed" in frame:
                pind = grid_pdist_keep(pose_pts, frame, NORM_TH)
            else:
                min_d = jax.lax.stop_gradient(
                    nearest_distance_fused(pose_pts, frame["pvertices"])
                )
                pind = keep_mask_with_argmin(min_d, NORM_TH)
            sidx, slot_valid, (c_pose, c_vd, c_dists, c_z), n, ovf = (
                compact_payload(pind, [pose_pts, vd, dists, z_flat], cap)
            )
            c_pbw, c_pnorm = jax.lax.stop_gradient(
                knn_blend_for_frame(c_pose, frame)
            )
            c_keep = keep_mask_with_argmin(
                jnp.where(slot_valid, c_pnorm[..., 0], jnp.inf), NORM_TH
            )
        else:
            # the fused Pallas KNN — the XLA twin would materialize the
            # (N, 6890) distance matrix
            pbw_all, pnorm = jax.lax.stop_gradient(
                knn_blend_for_frame(pose_pts, frame)
            )
            pind = keep_mask_with_argmin(pnorm[..., 0], NORM_TH)
            sidx, slot_valid, (c_pose, c_vd, c_dists, c_z, c_pbw), n, ovf = (
                compact_payload(
                    pind, [pose_pts, vd, dists, z_flat, pbw_all], cap
                )
            )
        # dead slots gathered the zero fill — all-zero blend weights make
        # the blended LBS matrix singular (NaN), and in training the NaN
        # poisons the backward pass through 0-cotangent products. Park
        # dead slots on bone 0 (any valid one-hot); their outputs are
        # masked everywhere downstream.
        c_pbw = jnp.where(
            slot_valid[:, None], c_pbw,
            jax.nn.one_hot(0, c_pbw.shape[-1], dtype=c_pbw.dtype),
        )
        return (sidx, slot_valid, c_pose, c_vd, c_dists, c_z, c_pbw, n,
                ovf, pind, c_keep)

    def _compact_finish(self, rgb_alpha, sidx, slot_valid, c_z, n,
                        n_rays, n_samples, precomposite, overflow,
                        ray_counts=None, pind=None, count_exact=None):
        """Either segment-composite the maps on the compacted stream or
        scatter raw back densely."""
        rgb, alpha = rgb_alpha[:, :3], rgb_alpha[:, 3]
        extras = {"compact_overflow": overflow}
        if pind is not None:
            extras["compact_count"] = survivor_count(pind)
        if count_exact is not None:
            # exact (post-weighted-filter) survivor count: the engine
            # ladder steers with BOTH counts — a rung must hold the
            # conservative count in pass-1 capacity AND this count in
            # stage2_capacity(cap) (otherwise frames whose
            # exact/conservative ratio exceeds stage2_ratio pay an extra
            # overflow escalation before settling)
            extras["compact_count_exact"] = count_exact
        if precomposite:
            from ..core.composite import composite_compacted

            rgb_map, acc_map, depth_map = composite_compacted(
                sidx, slot_valid, rgb, alpha, c_z, n_rays, n_samples,
                ray_counts=ray_counts,
            )
            return {
                "rgb_map": rgb_map, "acc_map": acc_map,
                "depth_map": depth_map, **extras,
            }
        return {
            "raw": self._scatter_raw(
                rgb_alpha, slot_valid, sidx, n, n_rays, n_samples
            ),
            **extras,
        }

    def _scatter_raw(self, raw_c, slot_valid, sidx, n, n_rays, n_samples):
        return scatter_compacted_raw(
            raw_c, slot_valid, sidx, n, n_rays, n_samples
        )


    def _train_stage2(self, sidx, sv, c_keep, cols, n, n_pts):
        """Stage-2 re-compaction for the TRAIN compacted paths (grid
        pass-1 only): the conservative pass-1 superset keeps ~1.3x the
        exact set (cap_widen), and without this the trunks run their
        forward AND backward over that widening's dead slots. Capacity
        is the config's own exact train_keep_frac capacity — the
        widening exists only for pass 1. Gradients are unchanged:
        dropped slots contributed exactly zero to every masked mean and
        scatter. Gated by stage2_ratio > 0 (same kill-switch as eval).

        Returns (sidx, slot_valid, cols_out, overflow2)."""
        keep_a = sv & c_keep
        cap_b = eval_capacity(n_pts, min(self.train_keep_frac, 1.0))
        sidx2, sv2, cols_out, _na, ovf2 = compact_payload(
            keep_a, cols, cap_b
        )
        sidx = jnp.concatenate(
            [sidx, jnp.full((1,), n, sidx.dtype)]
        )[sidx2]
        # re-park zero-filled dead slots on bone 0 (cols_out[-1] is pbw
        # by convention; all-zero bw = singular LBS)
        cols_out = list(cols_out)
        cols_out[-1] = jnp.where(
            sv2[:, None], cols_out[-1],
            jax.nn.one_hot(0, cols_out[-1].shape[-1],
                           dtype=cols_out[-1].dtype),
        )
        return sidx, sv2, cols_out, ovf2

    def _eval_compacted(self, pose_pts, vd, dists, z_vals, frame,
                        n_rays, n_samples, pts, precomposite, inside_fn):
        """Survivor-compacted eval shared by the whole family: pass-1
        conservative compaction, exact weighted-distance filter, an
        optional SECOND compaction to the exact-survivor capacity, then
        warp + canonical head + segmented composite."""
        (sidx, sv, c_pose, c_vd, c_dists, c_z, c_pbw, n, ovf,
         pind, c_keep) = self._compact_inputs(
            pose_pts, vd, dists, z_vals.reshape(-1), frame,
            self.eval_keep_frac, conservative=True,
        )
        ray_counts = pind.reshape(n_rays, n_samples).sum(-1)
        # exact weighted-distance filter on the compacted stream
        # (pass 1 was the conservative min-distance superset)
        keep_a = sv & c_keep
        if inside_fn is not None:
            # visibility carve on the survivors (models/aninerf.py)
            from .common import take_rows

            keep_a = keep_a & inside_fn(take_rows(pts, sidx))
        count_exact = jnp.sum(keep_a.astype(jnp.int32))
        if self.stage2_ratio > 0:
            # SECOND compaction: the exact filter (and carve) are known
            # BEFORE the warp/trunks, so the expensive stages (LBS warp,
            # resd MLP, SDF fwd+grad, color net) run at the
            # EXACT-survivor capacity instead of the conservative pass-1
            # one (~16% vs ~21% measured on the representative scene —
            # the grid margin + the min-vs-weighted distance gap are
            # dead slots that paid full trunk cost). Stage-2 overflow
            # joins compact_overflow: the engine ladder escalates the
            # rung, which scales BOTH capacities.
            cap_b = stage2_capacity(sidx.shape[0], self.stage2_ratio)
            (sidx2, sv2,
             (c_pose, c_vd, c_dists, c_z, c_pbw), _na, ovf2) = (
                compact_payload(
                    keep_a, [c_pose, c_vd, c_dists, c_z, c_pbw], cap_b
                )
            )
            # compose the dense routing: stage-2 dead slots ride the
            # appended sentinel to the dense sentinel row n
            sidx = jnp.concatenate(
                [sidx, jnp.full((1,), n, sidx.dtype)]
            )[sidx2]
            sv = sv2
            ovf = jnp.logical_or(ovf, ovf2)
            # stage-2 dead slots re-gathered the zero fill: park them on
            # bone 0 again (all-zero bw = singular LBS)
            c_pbw = jnp.where(
                sv[:, None], c_pbw,
                jax.nn.one_hot(0, c_pbw.shape[-1], dtype=c_pbw.dtype),
            )
            keep_a = sv  # exact filter already applied by compaction
            # ray_counts reflected the conservative pass-1 stream; the
            # compositor derives exact per-ray counts from the sorted
            # stream itself
            ray_counts = None
        c_pose_dirs = world_dirs_to_pose_dirs(c_vd, frame["R"])
        tpose, tdirs, _, _ = self._warp(
            c_pose, c_pose_dirs, frame, pbw=c_pbw
        )
        dirs = tdirs if self.tpose_viewdir else c_vd
        raw_c = self._eval_head(tpose, dirs, c_dists, frame)
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        keep = inside & keep_a
        raw_c = jnp.where(keep[:, None], raw_c, 0.0)
        return self._compact_finish(
            raw_c, sidx, sv, c_z, n, n_rays, n_samples, precomposite,
            ovf, ray_counts=ray_counts, pind=pind, count_exact=count_exact,
        )


class NeRFPDF(_PDFBase):
    """Displacement field + softplus canonical NeRF.

    Canonical field: GeometricFieldNetwork (257ch out — density +
    feature), color via the no-normals IDR net.
    Reference: aligned_aninerf_pdf_network.py.
    """

    def setup(self):
        self.resd_field = ResidualField(xyz_res=self.xyz_res,
                                        dtype=self.dtype)
        self.nerf_network = GeometricFieldNetwork(dtype=self.dtype)
        self.color_network = ColorNetwork(
            num_latents=self.num_latents, use_normals=False,
            dtype=self.dtype,
        )

    def density(self, wpts, frame):
        """World points -> density (mesh path,
        aligned_aninerf_pdf_network.py:141-175)."""
        pose_pts = world_points_to_pose_points(wpts, frame["R"], frame["Th"])
        pind = self._filter(pose_pts, frame)
        tpose, _, _, _ = self._warp(pose_pts, None, frame)
        sigma = self.nerf_network(tpose)[..., 0]
        return jnp.where(pind, sigma, 0.0)

    def _eval_head(self, tpose, dirs, dists, frame):
        out = self.nerf_network(tpose)
        sigma, feat = out[..., 0], out[..., 1:]
        alpha = raw_alpha_from_sigma(sigma, dists)
        rgb = self.color_network(tpose, None, dirs, feat, frame["latent_index"])
        return jnp.concatenate([rgb, alpha[:, None]], axis=-1)

    def __call__(self, wpts, viewdir, z_vals, frame, train: bool = True,
                 precomposite: bool = False, analytic_z: bool = False,
                 inside_fn=None):
        n_rays, n_samples = z_vals.shape
        pts = wpts.reshape(-1, 3)
        vd = broadcast_viewdirs(viewdir, n_samples)
        dists = z_vals_to_dists(z_vals).reshape(-1)

        pose_pts = world_points_to_pose_points(pts, frame["R"], frame["Th"])

        if not train and self.eval_keep_frac > 0:
            return self._eval_compacted(
                pose_pts, vd, dists, z_vals, frame, n_rays, n_samples,
                pts, precomposite, inside_fn,
            )
        if train and self.train_keep_frac > 0:
            # grid pass-1 when the frame store carries the packed
            # distance grid (see SDFPDF._train_compacted)
            grid = "pdist_packed" in frame
            sidx, sv, c_pose, c_vd, c_dists, _, c_pbw, n, ovf, _, c_keep = (
                self._compact_inputs(
                    pose_pts, vd, dists, z_vals.reshape(-1), frame,
                    self.train_keep_frac, conservative=grid,
                    cap_widen=1.3 if grid else 1.0,
                )
            )
            ovf2 = jnp.asarray(False)
            if grid and self.stage2_ratio > 0:
                # drop the conservative widening before fwd+bwd trunks
                sidx, sv, (c_pose, c_vd, c_dists, c_pbw), ovf2 = (
                    self._train_stage2(
                        sidx, sv, c_keep,
                        [c_pose, c_vd, c_dists, c_pbw], n,
                        pose_pts.shape[0],
                    )
                )
                ovf = jnp.logical_or(ovf, ovf2)
                c_keep = None  # exact filter applied by the compaction
            surv = sv if c_keep is None else (sv & c_keep)
            c_pose_dirs = world_dirs_to_pose_dirs(c_vd, frame["R"])
            tpose, tdirs, _, resd = self._warp(
                c_pose, c_pose_dirs, frame, pbw=c_pbw
            )
            dirs = tdirs if self.tpose_viewdir else c_vd
            raw_c = self._eval_head(tpose, dirs, c_dists, frame)
            inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
            keep = inside if c_keep is None else (inside & c_keep)
            raw_c = jnp.where(keep[:, None], raw_c, 0.0)
            return {
                "raw": self._scatter_raw(
                    raw_c, sv, sidx, n, n_rays, n_samples
                ),
                "resd": resd,
                "resd_mask": surv,
                "compact_overflow": ovf,
                # stage-2-only overflow: exact survivors fit the widened
                # pass-1 capacity but not the exact train_keep_frac one —
                # the trainer auto-falls-back to the widened stream
                "compact_overflow_stage2": ovf2,
            }

        pose_dirs = world_dirs_to_pose_dirs(vd, frame["R"])
        pind = self._filter(pose_pts, frame)
        # keep masked-out points off the warp (models/common.py
        # substitute_masked; the reference boolean-gathers first)
        pose_pts = substitute_masked(pose_pts, pind, frame["pvertices"][0])

        tpose, tpose_dirs, _, resd = self._warp(pose_pts, pose_dirs, frame)
        dirs = tpose_dirs if self.tpose_viewdir else vd

        raw = self._eval_head(tpose, dirs, dists, frame)

        # expanded canonical bbox filter (+-0.05,
        # aligned_aninerf_pdf_network.py:126-135)
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        raw = jnp.where((pind & inside)[:, None], raw, 0.0)

        return {
            "raw": raw.reshape(n_rays, n_samples, 4),
            "resd": resd,
            "resd_mask": pind,
        }


class SDFPDF(_PDFBase):
    """Displacement field + VolSDF canonical surface (flagship extension).

    Reference: anisdf_pdf_network.py. Normals/eikonal via jax.grad.
    """

    beta_init: float = 0.1
    color_with_viewdir: bool = True

    def setup(self):
        self.resd_field = ResidualField(xyz_res=self.xyz_res,
                                        dtype=self.dtype)
        self.sdf_network = GeometricFieldNetwork(dtype=self.dtype)
        self.beta_network = BetaNetwork(init_val=self.beta_init)
        self.color_network = ColorNetwork(
            num_latents=self.num_latents,
            use_normals=True,
            use_viewdir=self.color_with_viewdir,
            dtype=self.dtype,
        )

    # ---------------------------------------------------------- sdf utils
    def _sdf_and_grad(self, tpose):
        """sdf, feature and d(sdf)/d(point) at canonical points.

        Replaces torch.autograd.grad (anisdf_pdf_network.py:306-321).
        The network is pointwise (no cross-point mixing), so the
        per-point input gradient equals the gradient of the batched SUM
        — ONE full-width (N, 256) forward + backward instead of
        vmap-of-grad's N batched matvecs (M=1 matmuls waste the MXU;
        measured ~4x whole-step cost on v5e).
        """
        def f(pts):
            out = self.sdf_network(pts)
            return jnp.sum(out[..., 0]), out

        (_, out), grads = jax.value_and_grad(f, has_aux=True)(tpose)
        return out[..., :1], out[..., 1:], grads

    def _observed_grad(self, init_bigpose, frame):
        """d/dx [ sdf(x + resd(x)) ] — the eikonal term in observed space
        (anisdf_pdf_network.py:140-154). Same batched sum-gradient trick
        as _sdf_and_grad."""
        def deformed_sdf(pts):
            resd = self.resd_field(pts, frame["poses"])
            return jnp.sum(self.sdf_network(pts + resd)[..., 0])

        return jax.grad(deformed_sdf)(init_bigpose)

    def sdf(self, wpts, frame):
        """World points -> sdf, filled with +10 outside the filter
        (anisdf_pdf_network.py:226-260)."""
        pose_pts = world_points_to_pose_points(wpts, frame["R"], frame["Th"])
        pind = self._filter(pose_pts, frame)
        tpose, _, _, _ = self._warp(pose_pts, None, frame)
        sdf = self.sdf_network(tpose)[..., 0]
        return jnp.where(pind, sdf, 10.0)

    def canonical_sdf(self, tpose):
        """Canonical-space sdf (mesh extraction, sdf_mesh_renderer.py:51-81)."""
        return self.sdf_network(tpose)[..., 0]

    def canonical_resd(self, tpose, frame):
        return self.resd_field(tpose, frame["poses"])

    def canonical_normal(self, tpose):
        # batched sum-gradient (see _sdf_and_grad): pointwise network, so
        # d sum(sdf)/d pts IS the per-point normal field
        return jax.grad(lambda pts: jnp.sum(self.sdf_network(pts)[..., 0]))(
            tpose
        )

    def _eval_head(self, tpose, dirs, dists, frame):
        sdf, feat, gradients = self._sdf_and_grad(tpose)
        beta = self.beta_network()
        sigma = volsdf_sigma(sdf[..., 0], beta)
        alpha = sigma_to_alpha(sigma)
        rgb = self.color_network(
            tpose, gradients, dirs, feat, frame["latent_index"]
        )
        return jnp.concatenate([rgb, alpha[:, None]], axis=-1)

    def _train_compacted(self, pose_pts, vd, dists, z_vals, frame,
                         n_rays, n_samples):
        """Training forward with survivor compaction: displacement MLP,
        SDF autograd normals, color MLP and the observed-space eikonal
        run only on the compacted in-shell points. The silhouette loss
        needs the dense per-ray sdf layout, so the compacted sdf
        scatters back with the reference's +10 masked fill
        (anisdf_pdf_network.py:218-219); the point-wise eikonal/resd
        regularizers stay on the compacted stream (masked means)."""
        # grid pass-1 when the frame store carries the per-frame packed
        # distance grid: pass 1 is then a conservative superset and
        # `c_keep` (the exact weighted filter on the survivors) must
        # gate every mask that means "exact survivor" — loss and grads
        # stay equal to the dense masked path (pinned by
        # tests/test_trainer.py)
        grid = "pdist_packed" in frame
        sidx, sv, c_pose, c_vd, c_dists, _, c_pbw, n, ovf, _, c_keep = (
            self._compact_inputs(
                pose_pts, vd, dists, z_vals.reshape(-1), frame,
                self.train_keep_frac, conservative=grid,
                # the conservative superset keeps ~1.25x the exact set
                # (measured) — widen the TRAIN capacity so configs tuned
                # for the exact filter don't silently overflow
                cap_widen=1.3 if grid else 1.0,
            )
        )
        ovf2 = jnp.asarray(False)
        if grid and self.stage2_ratio > 0:
            # stage-2: drop the widening before the fwd+bwd trunks
            sidx, sv, (c_pose, c_vd, c_dists, c_pbw), ovf2 = (
                self._train_stage2(
                    sidx, sv, c_keep, [c_pose, c_vd, c_dists, c_pbw], n,
                    pose_pts.shape[0],
                )
            )
            ovf = jnp.logical_or(ovf, ovf2)
            c_keep = None  # exact filter applied by the compaction
        surv = sv if c_keep is None else (sv & c_keep)
        c_pose_dirs = world_dirs_to_pose_dirs(c_vd, frame["R"])
        tpose, tdirs, init_bigpose, resd = self._warp(
            c_pose, c_pose_dirs, frame, pbw=c_pbw
        )
        dirs = tdirs if self.tpose_viewdir else c_vd

        sdf, feat, gradients = self._sdf_and_grad(tpose)
        beta = self.beta_network()
        sigma = volsdf_sigma(sdf[..., 0], beta)
        alpha = sigma_to_alpha(sigma)
        rgb = self.color_network(
            tpose, gradients, dirs, feat, frame["latent_index"]
        )
        raw_c = jnp.concatenate([rgb, alpha[:, None]], axis=-1)
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        raw_c = jnp.where(
            inside[:, None] if c_keep is None else (inside & c_keep)[:, None],
            raw_c, 0.0,
        )

        # dense (R, S) sdf for the silhouette tensors; non-survivors and
        # dead slots carry the +10 fill
        sdf_c = jnp.where(surv, sdf[..., 0], 10.0)
        sdf_full = jnp.full((n + 1,), 10.0).at[sidx].set(
            sdf_c, mode="drop", indices_are_sorted=True
        )[:n]

        og_mask = surv & (
            jnp.abs(jax.lax.stop_gradient(sdf[..., 0])) < 0.02
        )
        return {
            "raw": self._scatter_raw(raw_c, sv, sidx, n, n_rays, n_samples),
            "sdf": sdf_full.reshape(n_rays, n_samples),
            "resd": resd,
            "resd_mask": surv,
            "gradients": gradients,
            "grad_mask": surv,
            "observed_gradients": self._observed_grad(
                jax.lax.stop_gradient(init_bigpose), frame
            ),
            "observed_grad_mask": og_mask,
            "compact_overflow": ovf,
            "compact_overflow_stage2": ovf2,
        }

    def __call__(self, wpts, viewdir, z_vals, frame, train: bool = True,
                 precomposite: bool = False, analytic_z: bool = False,
                 inside_fn=None):
        n_rays, n_samples = z_vals.shape
        pts = wpts.reshape(-1, 3)
        vd = broadcast_viewdirs(viewdir, n_samples)
        dists = z_vals_to_dists(z_vals).reshape(-1)

        pose_pts = world_points_to_pose_points(pts, frame["R"], frame["Th"])

        if not train and self.eval_keep_frac > 0:
            # survivor-compacted eval (shared _PDFBase._eval_compacted):
            # the SDF autograd normals and all MLPs run only on the
            # in-shell points, trunks at the exact-survivor capacity
            return self._eval_compacted(
                pose_pts, vd, dists, z_vals, frame, n_rays, n_samples,
                pts, precomposite, inside_fn,
            )
        if train and self.train_keep_frac > 0:
            return self._train_compacted(
                pose_pts, vd, dists, z_vals, frame, n_rays, n_samples
            )

        pose_dirs = world_dirs_to_pose_dirs(vd, frame["R"])
        pind = self._filter(pose_pts, frame)
        pose_pts = substitute_masked(pose_pts, pind, frame["pvertices"][0])

        tpose, tpose_dirs, init_bigpose, resd = self._warp(pose_pts, pose_dirs, frame)
        dirs = tpose_dirs if self.tpose_viewdir else vd

        # sdf + normals (anisdf_pdf_network.py:303-321)
        sdf, feat, gradients = self._sdf_and_grad(tpose)

        # VolSDF opacity (:324-331); the 0.005 step is the reference's
        beta = self.beta_network()
        sigma = volsdf_sigma(sdf[..., 0], beta)
        alpha = sigma_to_alpha(sigma)

        rgb = self.color_network(tpose, gradients, dirs, feat, frame["latent_index"])
        raw = jnp.concatenate([rgb, alpha[:, None]], axis=-1)

        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        raw = jnp.where((pind & inside)[:, None], raw, 0.0)

        ret = {
            "raw": raw.reshape(n_rays, n_samples, 4),
            # masked points carry sdf=+10 (anisdf_pdf_network.py:218-219)
            "sdf": jnp.where(pind, sdf[..., 0], 10.0).reshape(n_rays, n_samples),
            "resd": resd,
            "resd_mask": pind,
            "gradients": gradients,
            "grad_mask": pind,
        }

        if train:
            # observed-space eikonal at near-surface points (:194-199)
            og_mask = pind & (
                jnp.abs(jax.lax.stop_gradient(sdf[..., 0])) < 0.02
            )
            ret["observed_gradients"] = self._observed_grad(
                jax.lax.stop_gradient(init_bigpose), frame
            )
            ret["observed_grad_mask"] = og_mask
        return ret


class NeuSPDF(SDFPDF):
    """NeuS opacity variant (anisdf_neus_pdf_network.py): a learnable
    single inverse-variance replaces the beta net; opacity from per-ray
    sigmoid-CDF residuals."""

    def setup(self):
        self.resd_field = ResidualField(xyz_res=self.xyz_res,
                                        dtype=self.dtype)
        self.sdf_network = GeometricFieldNetwork(dtype=self.dtype)
        self.variance_network = SingleVarianceNetwork()
        self.color_network = ColorNetwork(
            num_latents=self.num_latents,
            use_normals=True,
            use_viewdir=self.color_with_viewdir,
            dtype=self.dtype,
        )

    def _eval_compacted_neus(self, pose_pts, vd, z_flat, frame, n_rays,
                             n_samples, inside_fn=None, wpts_flat=None,
                             precomposite: bool = False):
        """Eval compaction for the NeuS variant.

        NeuS opacity couples CONSECUTIVE samples of a ray (sigmoid-CDF
        residuals; the reference computes it on the dense grid with
        masked points filled to +10 and scatters through batch['pind'],
        sdf_utils.py:40-61 + anisdf_neus_pdf_network.py:231-261). The
        expensive per-point work (SDF MLP, autograd normals, color net)
        runs only on the compacted survivors in all cases; what differs
        is the alpha conversion:

          * precomposite (the production eval path): the alpha is
            computed ON THE STREAM — a sample's CDF neighbor is either
            the adjacent STREAM slot (stable compaction keeps global
            sample order, so 'next sample of my ray survived' <=>
            'next slot holds global index g+1') or the +10 fill's CDF,
            exactly the value the dense grid would hold at that
            position. rgb/acc/depth then composite on the stream
            (composite_compacted) — no dense scatter at all. This
            closed NeuS's measured 11% whole-frame gap vs SDF-PDF
            (VERDICT-r3 item 5): the dense scatter-back serialized per
            source row.
          * otherwise (dense-carve fallback): the scalar sdf / rgb
            scatter back densely (+10 / 0 fills) and the alpha runs on
            the (R, S) grid — bit-identical semantics, kept as the
            oracle for the stream formulation (pinned by
            tests/test_render.py)."""
        (sidx, sv, c_pose, c_vd, _, c_z, c_pbw, n, ovf, pind, c_keep) = (
            self._compact_inputs(
                pose_pts, vd, jnp.zeros_like(z_flat), z_flat, frame,
                self.eval_keep_frac, conservative=True,
            )
        )
        ray_counts = pind.reshape(n_rays, n_samples).sum(-1)
        carve = None
        if inside_fn is not None:
            # visibility carve on the survivors (models/aninerf.py);
            # zeroes rgb AND the alpha gate (dense[..., 4]) like the
            # dense renderer's raw * vis — but NOT the sdf fill, so it
            # is carried separately through the stage-2 compaction
            from .common import take_rows

            carve = inside_fn(take_rows(wpts_flat, sidx))
        # exact survivors the stage-2 capacity must hold (carved slots
        # stay in the stream — neighbors still read their sdf)
        count_exact = jnp.sum((sv & c_keep).astype(jnp.int32))
        if self.stage2_ratio > 0:
            # stage-2 compaction (see _PDFBase._eval_compacted): slots
            # failing the exact weighted filter would write the same
            # +10 sdf fill the scatter default produces, so dropping
            # them before the trunks is exact
            keep_a = sv & c_keep
            cols = [c_pose, c_vd, c_pbw, c_z]
            if carve is not None:
                cols.append(carve.astype(jnp.float32))
            cap_b = stage2_capacity(sidx.shape[0], self.stage2_ratio)
            sidx2, sv2, cols_out, _na, ovf2 = compact_payload(
                keep_a, cols, cap_b
            )
            c_pose, c_vd, c_pbw, c_z = cols_out[:4]
            if carve is not None:
                carve = cols_out[4] > 0.5
            sidx = jnp.concatenate(
                [sidx, jnp.full((1,), n, sidx.dtype)]
            )[sidx2]
            sv = sv2
            ovf = jnp.logical_or(ovf, ovf2)
            c_pbw = jnp.where(
                sv[:, None], c_pbw,
                jax.nn.one_hot(0, c_pbw.shape[-1], dtype=c_pbw.dtype),
            )
            c_keep = sv  # exact filter applied by the compaction
            ray_counts = None  # compositor derives counts from the stream
        c_pose_dirs = world_dirs_to_pose_dirs(c_vd, frame["R"])
        tpose, tdirs, _, _ = self._warp(c_pose, c_pose_dirs, frame, pbw=c_pbw)
        dirs = tdirs if self.tpose_viewdir else c_vd

        sdf, feat, gradients = self._sdf_and_grad(tpose)
        rgb = self.color_network(
            tpose, gradients, dirs, feat, frame["latent_index"]
        )
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        keep = c_keep & inside
        if carve is not None:
            keep = keep & carve

        extras = {
            "compact_overflow": ovf,
            "compact_count": survivor_count(pind),
            "compact_count_exact": count_exact,
        }
        inv_var = self.variance_network()
        if precomposite:
            # ---- on-stream alpha (no dense scatter). A position of the
            # dense grid holds the true sdf iff its slot passed the
            # exact filter (sv & c_keep) and +10 otherwise; the stable
            # compaction keeps global order, so sample g+1/g-1 of the
            # same ray is live in the stream iff the adjacent SLOT holds
            # exactly that global index.
            live = sv & c_keep
            cdf_own = jax.nn.sigmoid(
                jnp.where(live, sdf[..., 0], 10.0) * inv_var
            )
            cdf_fill = jax.nn.sigmoid(10.0 * inv_var)
            g = sidx  # sentinel n on dead slots (cannot alias g+1/g-1)
            i = g % n_samples
            nxt_g = jnp.concatenate([g[1:], jnp.full((1,), n, g.dtype)])
            nxt_cdf = jnp.concatenate([cdf_own[1:], cdf_own[-1:]])
            has_next = (nxt_g == g + 1) & (i < n_samples - 1)
            cdf_next = jnp.where(has_next, nxt_cdf, cdf_fill)
            prv_g = jnp.concatenate([jnp.full((1,), -2, g.dtype), g[:-1]])
            prv_cdf = jnp.concatenate([cdf_own[:1], cdf_own[:-1]])
            has_prev = (prv_g == g - 1) & (i > 0)
            cdf_prev = jnp.where(has_prev, prv_cdf, cdf_fill)
            is_last = i == n_samples - 1
            # sdf_utils.py:49-58: p_i = cdf_i - cdf_{i+1}, last residual
            # repeated; alpha = clip((p + 1e-5)/(cdf + 1e-5), 0, 1)
            p = jnp.where(is_last, cdf_prev - cdf_own, cdf_own - cdf_next)
            alpha = jnp.clip((p + 1e-5) / (cdf_own + 1e-5), 0.0, 1.0)
            alpha = jnp.where(keep, alpha, 0.0)
            from ..core.composite import composite_compacted

            rgb_map, acc_map, depth_map = composite_compacted(
                sidx, sv, jnp.where(keep[:, None], rgb, 0.0), alpha, c_z,
                n_rays, n_samples, ray_counts=ray_counts,
            )
            return {
                "rgb_map": rgb_map, "acc_map": acc_map,
                "depth_map": depth_map, **extras,
            }

        # ---- dense scatter fallback (the oracle formulation): scatter
        # (sdf - 10) with zero fill, then shift back
        sdf_c = jnp.where(c_keep, sdf[..., 0], 10.0)
        payload = jnp.concatenate(
            [jnp.where(keep[:, None], rgb, 0.0), (sdf_c - 10.0)[:, None],
             keep[:, None].astype(rgb.dtype)],
            axis=-1,
        )
        dense = scatter_compacted_raw(payload, sv, sidx, n, n_rays, n_samples)
        sdf_full = dense[..., 3] + 10.0
        alpha = neus_alpha(sdf_full, inv_var)
        # the reference zeroes masked points' raw exactly (:256-258)
        alpha = alpha * dense[..., 4]
        raw = jnp.concatenate([dense[..., :3], alpha[..., None]], axis=-1)
        return {"raw": raw, "sdf": sdf_full, **extras}

    def _train_compacted_neus(self, pose_pts, vd, z_flat, frame, n_rays,
                              n_samples):
        """Train-time survivor compaction for NeuS: the warp, SDF
        autograd normals, color net and observed-space eikonal run only
        on the compacted in-shell points; the scalar sdf / rgb / keep
        scatter back densely for the per-ray CDF-residual alpha (exactly
        the eval compaction's layout, _eval_compacted_neus). Loss and
        gradients equal the dense masked path while survivors fit
        capacity (masked means over `surv`)."""
        grid = "pdist_packed" in frame
        (sidx, sv, c_pose, c_vd, _, _, c_pbw, n, ovf, _, c_keep) = (
            self._compact_inputs(
                pose_pts, vd, jnp.zeros_like(z_flat), z_flat, frame,
                self.train_keep_frac, conservative=grid,
                cap_widen=1.3 if grid else 1.0,
            )
        )
        ovf2 = jnp.asarray(False)
        if grid and self.stage2_ratio > 0:
            # stage-2: drop the widening before the fwd+bwd trunks
            sidx, sv, (c_pose, c_vd, c_pbw), ovf2 = self._train_stage2(
                sidx, sv, c_keep, [c_pose, c_vd, c_pbw], n,
                pose_pts.shape[0],
            )
            ovf = jnp.logical_or(ovf, ovf2)
            c_keep = None  # exact filter applied by the compaction
        surv = sv if c_keep is None else (sv & c_keep)
        c_pose_dirs = world_dirs_to_pose_dirs(c_vd, frame["R"])
        tpose, tdirs, init_bigpose, resd = self._warp(
            c_pose, c_pose_dirs, frame, pbw=c_pbw
        )
        dirs = tdirs if self.tpose_viewdir else c_vd
        sdf, feat, gradients = self._sdf_and_grad(tpose)
        rgb = self.color_network(
            tpose, gradients, dirs, feat, frame["latent_index"]
        )
        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        keep = surv & inside

        sdf_c = jnp.where(surv, sdf[..., 0], 10.0)
        payload = jnp.concatenate(
            [jnp.where(keep[:, None], rgb, 0.0), (sdf_c - 10.0)[:, None],
             keep[:, None].astype(rgb.dtype)],
            axis=-1,
        )
        dense = scatter_compacted_raw(payload, sv, sidx, n, n_rays, n_samples)
        sdf_full = dense[..., 3] + 10.0
        alpha = neus_alpha(sdf_full, self.variance_network())
        alpha = alpha * dense[..., 4]
        raw = jnp.concatenate([dense[..., :3], alpha[..., None]], axis=-1)
        og_mask = surv & (
            jnp.abs(jax.lax.stop_gradient(sdf[..., 0])) < 0.02
        )
        return {
            "raw": raw,
            "sdf": sdf_full,
            "resd": resd,
            "resd_mask": surv,
            "gradients": gradients,
            "grad_mask": surv,
            "observed_gradients": self._observed_grad(
                jax.lax.stop_gradient(init_bigpose), frame
            ),
            "observed_grad_mask": og_mask,
            "compact_overflow": ovf,
            "compact_overflow_stage2": ovf2,
        }

    def __call__(self, wpts, viewdir, z_vals, frame, train: bool = True,
                 precomposite: bool = False, analytic_z: bool = False,
                 inside_fn=None):
        n_rays, n_samples = z_vals.shape
        pts = wpts.reshape(-1, 3)
        vd = broadcast_viewdirs(viewdir, n_samples)

        pose_pts = world_points_to_pose_points(pts, frame["R"], frame["Th"])
        if not train and self.eval_keep_frac > 0:
            return self._eval_compacted_neus(
                pose_pts, vd, z_vals.reshape(-1), frame, n_rays, n_samples,
                inside_fn=inside_fn, wpts_flat=pts,
                precomposite=precomposite,
            )
        if train and self.train_keep_frac > 0:
            return self._train_compacted_neus(
                pose_pts, vd, z_vals.reshape(-1), frame, n_rays, n_samples
            )
        pose_dirs = world_dirs_to_pose_dirs(vd, frame["R"])
        pind = self._filter(pose_pts, frame)
        pose_pts = substitute_masked(pose_pts, pind, frame["pvertices"][0])

        tpose, tpose_dirs, init_bigpose, resd = self._warp(pose_pts, pose_dirs, frame)
        dirs = tpose_dirs if self.tpose_viewdir else vd

        sdf, feat, gradients = self._sdf_and_grad(tpose)

        # NeuS opacity needs the ray-ordered sdf with masked points at +10
        # (sdf_utils.py:40-61; the masked-fill reproduces full_cdf = 1)
        sdf_full = jnp.where(pind, sdf[..., 0], 10.0).reshape(n_rays, n_samples)
        inv_var = self.variance_network()
        alpha = neus_alpha(sdf_full, inv_var).reshape(-1)

        rgb = self.color_network(tpose, gradients, dirs, feat, frame["latent_index"])
        raw = jnp.concatenate([rgb, alpha[:, None]], axis=-1)

        inside = inside_bounds(tpose, frame["tbounds"], pad=0.05)
        raw = jnp.where((pind & inside)[:, None], raw, 0.0)

        ret = {
            "raw": raw.reshape(n_rays, n_samples, 4),
            "sdf": sdf_full,
            "resd": resd,
            "resd_mask": pind,
            "gradients": gradients,
            "grad_mask": pind,
        }
        if train:
            og_mask = pind & (
                jnp.abs(jax.lax.stop_gradient(sdf[..., 0])) < 0.02
            )
            ret["observed_gradients"] = self._observed_grad(
                jax.lax.stop_gradient(init_bigpose), frame
            )
            ret["observed_grad_mask"] = og_mask
        return ret
