"""Novel-view and pose-sequence datasets.

NovelViewDataset  — render one fixed frame from a synthesized camera
  spiral; packages every training view's dilated mask + intrinsics so the
  renderer can carve visibility (tpose_novel_view_dataset.py:123-196,
  pdf variant tpose_pdf_novel_view_dataset.py).
PoseSequenceDataset — animate over frames from one fixed camera
  (tpose_pose_sequence_dataset.py:119-192).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..core.rays import get_rays_np, get_near_far_np
from .dataset import TPoseDataset, TPosePDFDataset, _imread_rgb
from .camera_path import load_cams, gen_path
from .utils import get_bounds


def get_rays_within_bounds(H, W, K, R, T, bounds):
    """All rays whose slab test passes + the (H, W) hit mask
    (if_nerf_data_utils.py:310-339)."""
    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    ray_o = ray_o.reshape(-1, 3)
    ray_d = ray_d.reshape(-1, 3)
    near, far, mask = get_near_far_np(bounds, ray_o, ray_d)
    return (
        ray_o[mask],
        ray_d[mask],
        near,
        far,
        mask.reshape(H, W),
    )


class _VisMixin:
    """Shared: dilated training-view masks for visibility carving
    (tpose_novel_view_dataset.py:85-122).

    Frame-id conventions: `annot_pos` indexes the annots.npy ims table
    by POSITION; `file_id` is the number embedded in the image/params
    filenames (they differ for CoreView_313/315, where file ids are
    1-based — frame_index_of)."""

    def _file_id_at(self, annot_pos: int) -> int:
        name = self.annots_ims[annot_pos]["ims"][0]
        return self.frame_index_of(name)[1]

    def _train_view_masks(self, annot_pos, H, W):
        # cached: novel-view datasets render MANY views of ONE frame, and
        # this rebuilds every training view's mask (imread + undistort +
        # dilate) otherwise
        cache = getattr(self, "_vis_mask_cache", None)
        if cache is None:
            cache = self._vis_mask_cache = {}
        key = (annot_pos, H, W)
        if key in cache:
            return cache[key]
        msks = []
        # TRAINING views only: the reference packages the carve masks
        # for cfg.training_view (tpose_novel_view_dataset.py:32-36,
        # aninerf_mesh_dataset.py:27-40) — including eval views would
        # carve with masks the training never saw (golden data test)
        ims = np.array(self.annots_ims[annot_pos]["ims"])[
            list(self.cfg.training_view)
        ]
        for nv, im in zip(list(self.cfg.training_view), ims):
            candidates = [
                os.path.join(self.data_root, "mask_cihp", im)[:-4] + ".png",
                os.path.join(self.data_root, im.replace("images", "mask"))[:-4]
                + ".png",
                os.path.join(self.data_root, im.replace("images", "mask"))[:-4]
                + ".jpg",
            ]
            p = next((c for c in candidates if os.path.exists(c)), candidates[0])
            msk = _imread_rgb(p)
            if msk.ndim == 3:
                msk = msk[..., 0]
            msk = (msk != 0).astype(np.uint8)
            K = np.array(self.cams["K"][nv])
            msk = cv2.undistort(msk, K, np.array(self.cams["D"][nv]))
            kernel = np.ones((5, 5), np.uint8)
            msk = cv2.dilate(msk, kernel)
            msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
            msks.append(msk)
        out = np.array(msks)
        if len(cache) >= 4:
            cache.pop(next(iter(cache)))
        cache[key] = out
        return out

    def _vis_cams(self, H, W):
        Ks = []
        RTs = []
        for i in list(self.cfg.training_view):
            K = np.array(self.cams["K"][i]).copy()
            K[:2] = K[:2] * self.cfg.ratio
            Ks.append(K)
            r = np.array(self.cams["R"][i])
            t = (np.array(self.cams["T"][i]) / 1000.0).reshape(3, 1)
            RTs.append(np.concatenate([r, t], 1))
        return np.array(Ks).astype(np.float32), np.array(RTs).astype(np.float32)


def _make_novel_view(base_cls):
    class _NovelView(base_cls, _VisMixin):
        def __init__(self, cfg, split="test"):
            super().__init__(cfg, split)
            Ks, RTs = load_cams(
                (cfg.test_dataset if split == "test" else cfg.train_dataset)[
                    "ann_file"
                ],
                ratio=cfg.ratio,
            )
            self.render_w2c = gen_path(RTs, cfg.render_views)
            self.K_render = np.array(Ks[0])

        def __len__(self):
            return len(self.render_w2c)

        def __getitem__(self, index):
            annot_pos = self.cfg.begin_ith_frame * self.cfg.frame_interval
            frame_index = self._file_id_at(annot_pos)
            item = self._frame_item(frame_index, annot_pos)
            img0 = _imread_rgb(os.path.join(self.data_root, self.ims[0]))
            H, W = img0.shape[:2]
            H, W = int(H * self.cfg.ratio), int(W * self.cfg.ratio)

            RT = self.render_w2c[index]
            R, T = RT[:3, :3], RT[:3, 3]
            ray_o, ray_d, near, far, mask_at_box = get_rays_within_bounds(
                H, W, self.K_render, R.astype(np.float32), T.astype(np.float32),
                item["wbounds"],
            )
            Ks, RTs = self._vis_cams(H, W)
            item.update(
                ray_o=ray_o,
                ray_d=ray_d,
                near=near,
                far=far,
                mask_at_box=mask_at_box,
                msks=self._train_view_masks(annot_pos, H, W),
                Ks=Ks,
                RT=RTs,
                H=H,
                W=W,
                view_index=index,
                latent_index=min(
                    self.cfg.begin_ith_frame, self.cfg.num_train_frame - 1
                ),
                frame_index=frame_index,
            )
            return item

    return _NovelView


def _make_pose_sequence(base_cls):
    class _PoseSeq(base_cls, _VisMixin):
        def __init__(self, cfg, split="test"):
            super().__init__(cfg, split)
            # fixed camera = first test view
            self.fixed_cam = self.cam_inds[0]

        def __len__(self):
            n = (
                self.cfg.num_eval_frame
                if (self.cfg.test_novel_pose or self.cfg.aninerf_animation)
                else self.cfg.num_train_frame
            )
            return n

        def __getitem__(self, index):
            i0 = self.cfg.begin_ith_frame
            if self.cfg.test_novel_pose or self.cfg.aninerf_animation:
                i0 = i0 + self.cfg.num_train_frame
            annot_pos = (i0 + index) * self.cfg.frame_interval
            frame_index = self._file_id_at(annot_pos)
            item = self._frame_item(frame_index, annot_pos)

            cam = self.fixed_cam
            K = np.array(self.cams["K"][cam]).copy()
            K[:2] = K[:2] * self.cfg.ratio
            R = np.array(self.cams["R"][cam]).astype(np.float32)
            T = (np.array(self.cams["T"][cam]) / 1000.0).astype(np.float32).reshape(3)
            img0 = _imread_rgb(os.path.join(self.data_root, self.ims[0]))
            H, W = img0.shape[:2]
            H, W = int(H * self.cfg.ratio), int(W * self.cfg.ratio)
            ray_o, ray_d, near, far, mask_at_box = get_rays_within_bounds(
                H, W, K, R, T, item["wbounds"]
            )
            Ks, RTs = self._vis_cams(H, W)
            item.update(
                ray_o=ray_o,
                ray_d=ray_d,
                near=near,
                far=far,
                mask_at_box=mask_at_box,
                msks=self._train_view_masks(annot_pos, H, W),
                Ks=Ks,
                RT=RTs,
                H=H,
                W=W,
                view_index=cam,
                frame_index=frame_index,
            )
            return item

    return _PoseSeq


class _GridFrameMixin(TPoseDataset):
    """Per-frame metadata for grid (aninerf) models, no image IO."""

    def _frame_item(self, i, annot_pos=None):
        # reuse the per-frame cache (load+pad is the dominant cost)
        wpts, A, pbw, pbounds, wbounds, Rh, Th, Rw = self._frame_inputs(i)
        pos = annot_pos if annot_pos is not None else i
        latent_index = min(pos // max(self.cfg.frame_interval, 1),
                           self.cfg.num_train_frame - 1)
        return {
            "A": A,
            "big_A": self.big_A,
            "pbw": pbw,
            "tbw": self.tbw,
            "pbounds": pbounds,
            "wbounds": wbounds,
            "tbounds": self.tbounds,
            "R": Rw,
            "Th": Th,
            "latent_index": latent_index,
            "bw_latent_index": 0,
        }


class _PDFFrameMixin(TPosePDFDataset):
    """Per-frame metadata for KNN/pdf models, no image IO."""

    def _frame_item(self, i, annot_pos=None):
        wpts, ppts, A, poses, posed_joints, Rh, Th, Rw = self.prepare_input(i)
        pbounds = get_bounds(ppts, self.cfg.box_padding)
        wbounds = get_bounds(wpts, self.cfg.box_padding)
        pos = annot_pos if annot_pos is not None else i
        latent_index = min(pos // max(self.cfg.frame_interval, 1),
                           self.cfg.num_train_frame - 1)
        if self.training_joints is not None:
            n = self.nearest_training_frame(posed_joints)
            if n is not None:
                latent_index = n
        return {
            "A": A,
            "big_A": self.big_A,
            "poses": poses,
            "weights": self.weights,
            "tvertices": self.tpose,
            "pvertices": ppts,
            "pbounds": pbounds,
            "wbounds": wbounds,
            "tbounds": self.tbounds,
            "R": Rw,
            "Th": Th,
            "latent_index": latent_index,
            "bw_latent_index": 0,
        }


NovelViewDataset = _make_novel_view(_GridFrameMixin)
NovelViewPDFDataset = _make_novel_view(_PDFFrameMixin)
PoseSequenceDataset = _make_pose_sequence(_GridFrameMixin)
PoseSequencePDFDataset = _make_pose_sequence(_PDFFrameMixin)
