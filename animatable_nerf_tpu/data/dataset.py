"""Train/eval datasets reading the reference's on-disk format.

TPoseDataset  — grid blend-weight models (aninerf); mirrors
                lib/datasets/tpose_dataset.py.
TPosePDFDataset — KNN/displacement models (aligned/pdf/sdf); mirrors
                lib/datasets/tpose_pdf_dataset.py (raw SMPL weights +
                posed/canonical vertices instead of voxel grids, optional
                big-pose template, nearest-training-pose latents).

TPU-specific behavior: per-frame variable-shape blend-weight volumes are
edge-padded to a dataset-wide max shape with equivalently extended
bounds (data/utils.pad_volume_to) so one jitted program serves every
frame.
"""

from __future__ import annotations

import os
import threading

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..core.skeleton import (
    rigid_transforms,
    rigid_transforms_host,
    big_pose_A,
    big_poses_vec,
)
from .utils import (
    erode_mask_edge,
    crop_mask_edge,
    get_bounds,
    sample_rays_image,
    pad_volume_to,
)


def _imread_rgb(path):
    img = cv2.imread(path, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise FileNotFoundError(path)
    if img.ndim == 3:
        img = img[..., :3][..., ::-1]
    return np.ascontiguousarray(img)


class _BaseDataset:
    """Shared camera/image handling (tpose_dataset.py:15-123)."""

    def __init__(self, cfg, split: str):
        self.cfg = cfg
        self.split = split
        dcfg = cfg.train_dataset if split == "train" else cfg.test_dataset
        self.data_root = dcfg["data_root"]
        self.human = dcfg["human"]
        annots = np.load(dcfg["ann_file"], allow_pickle=True).item()
        self.cams = annots["cams"]
        self.annots_ims = annots["ims"]  # full per-frame image table

        num_cams = len(self.cams["K"])
        if len(cfg.test_view) == 0:
            test_view = [i for i in range(num_cams) if i not in cfg.training_view]
            if len(test_view) == 0:
                test_view = [0]
        else:
            test_view = list(cfg.test_view)
        view = list(cfg.training_view) if split == "train" else test_view

        i = cfg.begin_ith_frame
        i_intv = cfg.frame_interval
        ni = cfg.num_train_frame
        if cfg.test_novel_pose or cfg.aninerf_animation:
            i = cfg.begin_ith_frame + cfg.num_train_frame * i_intv
            ni = cfg.num_eval_frame

        self.ims = np.array(
            [
                np.array(ims_data["ims"])[view]
                for ims_data in annots["ims"][i : i + ni * i_intv][::i_intv]
            ]
        ).ravel()
        self.cam_inds = np.array(
            [
                np.arange(len(ims_data["ims"]))[view]
                for ims_data in annots["ims"][i : i + ni * i_intv][::i_intv]
            ]
        ).ravel()
        self.num_cams = len(view)

        self.lbs_root = os.path.join(self.data_root, "lbs")
        self.joints = np.load(os.path.join(self.lbs_root, "joints.npy")).astype(
            np.float32
        )
        self.parents = np.load(os.path.join(self.lbs_root, "parents.npy"))
        self.big_A = np.asarray(
            big_pose_A(self.joints, self.parents)
        ).astype(np.float32)
        self.nrays = cfg.N_rand
        self._rng = np.random.RandomState()

    def __len__(self):
        return len(self.ims)

    def get_mask(self, index):
        """tpose_dataset.py:92-123 (path fallbacks + edge erosion)."""
        im = self.ims[index]
        candidates = [
            os.path.join(self.data_root, "mask_cihp", im)[:-4] + ".png",
            os.path.join(self.data_root, im.replace("images", "mask"))[:-4] + ".png",
            os.path.join(self.data_root, im.replace("images", "mask"))[:-4] + ".jpg",
            os.path.join(self.data_root, "mask", im)[:-4] + ".png",
        ]
        msk_path = next((p for p in candidates if os.path.exists(p)), candidates[0])
        msk = _imread_rgb(msk_path)
        if msk.ndim == 3:
            msk = msk[..., 0]
        if "deepcap" in self.data_root:
            msk = (msk > 125).astype(np.uint8)
        else:
            msk = (msk != 0).astype(np.uint8)
        orig_msk = msk.copy()
        if not self.cfg.eval and self.cfg.erode_edge:
            msk = erode_mask_edge(msk, border=5)
        return msk, orig_msk

    def load_image(self, index):
        img_path = os.path.join(self.data_root, self.ims[index])
        img = _imread_rgb(img_path).astype(np.float32) / 255.0
        msk, orig_msk = self.get_mask(index)
        H, W = img.shape[:2]
        msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
        orig_msk = cv2.resize(orig_msk, (W, H), interpolation=cv2.INTER_NEAREST)

        cam_ind = self.cam_inds[index]
        K = np.array(self.cams["K"][cam_ind])
        D = np.array(self.cams["D"][cam_ind])
        img = cv2.undistort(img, K, D)
        msk = cv2.undistort(msk, K, D)
        orig_msk = cv2.undistort(orig_msk, K, D)
        R = np.array(self.cams["R"][cam_ind])
        T = np.array(self.cams["T"][cam_ind]) / 1000.0

        ratio = self.cfg.ratio
        H, W = int(img.shape[0] * ratio), int(img.shape[1] * ratio)
        img = cv2.resize(img, (W, H), interpolation=cv2.INTER_AREA)
        msk = cv2.resize(msk, (W, H), interpolation=cv2.INTER_NEAREST)
        orig_msk = cv2.resize(orig_msk, (W, H), interpolation=cv2.INTER_NEAREST)
        if self.cfg.mask_bkgd:
            img[msk == 0] = 0
        K = K.copy()
        K[:2] = K[:2] * ratio
        return img, msk, orig_msk, K, R, T, cam_ind, img_path

    def frame_index_of(self, img_path):
        if self.human in ["CoreView_313", "CoreView_315"]:
            i = int(os.path.basename(img_path).split("_")[4])
            return i - 1, i
        i = int(os.path.basename(img_path)[:-4])
        return i, i

    def latent_indices(self, index):
        """tpose_dataset.py:264-276."""
        latent_index = index // self.num_cams
        bw_latent_index = index // self.num_cams
        if self.cfg.test_novel_pose:
            if "h36m" in self.data_root:
                latent_index = 0
            else:
                latent_index = self.cfg.num_train_frame - 1
        return latent_index, bw_latent_index

    def sample_rays(self, img, msk, K, R, T, wbounds):
        return sample_rays_image(
            img,
            msk,
            K,
            R,
            T,
            wbounds,
            self.nrays,
            self.split,
            body_sample_ratio=self.cfg.body_sample_ratio,
            face_sample_ratio=self.cfg.face_sample_ratio,
            mask_bkgd=self.cfg.mask_bkgd,
            rng=self._rng,
        )


class TPoseDataset(_BaseDataset):
    """Grid blend-weight dataset (aninerf family)."""

    def __init__(self, cfg, split: str):
        super().__init__(cfg, split)
        tpose = np.load(os.path.join(self.lbs_root, "tvertices.npy")).astype(
            np.float32
        )
        self.tpose = tpose
        self.tbounds = get_bounds(tpose, cfg.box_padding)
        self.tbw = np.load(os.path.join(self.lbs_root, "tbw.npy")).astype(np.float32)

        # dataset-wide max bw-volume shape (static shapes for jit)
        self._frame_ids = sorted(
            {self.frame_index_of(os.path.join(self.data_root, im))[1] for im in self.ims}
        )
        shapes = []
        # per-frame input cache (pose metadata + padded bw grid); guarded
        # by a lock: the Loader calls __getitem__ from worker threads
        self._frame_cache = {}
        self._frame_cache_lock = threading.Lock()
        for fid in self._frame_ids:
            p = os.path.join(self.lbs_root, f"bweights/{fid}.npy")
            vol = np.load(p, mmap_mode="r")
            shapes.append(vol.shape[:3])
        self.max_pbw_shape = tuple(np.max(np.array(shapes), axis=0))

    def prepare_input(self, i):
        """tpose_dataset.py:125-161."""
        wxyz = np.load(
            os.path.join(self.data_root, self.cfg.vertices, f"{i}.npy")
        ).astype(np.float32)
        params = np.load(
            os.path.join(self.data_root, self.cfg.params, f"{i}.npy"),
            allow_pickle=True,
        ).item()
        Rh = params["Rh"].astype(np.float32).reshape(3)
        Th = params["Th"].astype(np.float32).reshape(1, 3)
        R = cv2.Rodrigues(Rh)[0].astype(np.float32)
        pxyz = np.dot(wxyz - Th, R).astype(np.float32)
        poses = params["poses"].reshape(-1, 3).astype(np.float32)
        A = rigid_transforms_host(poses, self.joints, self.parents).astype(
            np.float32
        )
        pbw = np.asarray(
            np.load(os.path.join(self.lbs_root, f"bweights/{i}.npy")),
            dtype=np.float32,
        )
        return wxyz, pxyz, A, pbw, Rh, Th, R

    def _frame_inputs(self, i):
        """Per-frame pose metadata + padded bw grid, cached: all views of
        a frame share it, and the grid load+pad is the dataloader's
        dominant cost (the reference re-does it per item in every
        worker — tpose_dataset.py:155-159)."""
        cache = self._frame_cache
        with self._frame_cache_lock:
            hit = cache.get(i)
        if hit is None:
            wpts, ppts, A, pbw, Rh, Th, Rw = self.prepare_input(i)
            pbounds = get_bounds(ppts, self.cfg.box_padding)
            wbounds = get_bounds(wpts, self.cfg.box_padding)
            pbw, pbounds = pad_volume_to(pbw, pbounds, self.max_pbw_shape)
            hit = (wpts, A, pbw, pbounds, wbounds, Rh, Th, Rw)
            with self._frame_cache_lock:
                if len(cache) >= 8:
                    cache.pop(next(iter(cache)), None)
                cache[i] = hit
        return hit

    def frame_meta(self, index):
        """One item's per-frame metadata WITHOUT the image pipeline or
        ray sampling: no cv2 IO, and the ray-sampling RNG is untouched
        (consumed by train.trainer.build_frame_store)."""
        frame_index, i = self.frame_index_of(self.ims[index])
        wpts, A, pbw, pbounds, wbounds, Rh, Th, Rw = self._frame_inputs(i)
        return {
            "frame_index": frame_index,
            "A": A,
            "big_A": self.big_A,
            "pbw": pbw,
            "tbw": self.tbw,
            "pbounds": pbounds,
            "wbounds": wbounds,
            "tbounds": self.tbounds,
            "R": Rw,
            "Th": Th,
        }

    def __getitem__(self, index):
        img, msk, orig_msk, K, R, T, cam_ind, img_path = self.load_image(index)
        frame_index, i = self.frame_index_of(img_path)

        wpts, A, pbw, pbounds, wbounds, Rh, Th, Rw = self._frame_inputs(i)

        rgb, ray_o, ray_d, near, far, coord, mask_at_box = self.sample_rays(
            img, msk, K, R, T, wbounds
        )
        if self.cfg.erode_edge:
            orig_msk = crop_mask_edge(orig_msk)
        occupancy = orig_msk[coord[:, 0], coord[:, 1]]
        latent_index, bw_latent_index = self.latent_indices(index)

        return {
            "rgb": rgb,
            "occupancy": occupancy,
            "ray_o": ray_o,
            "ray_d": ray_d,
            "near": near,
            "far": far,
            "mask_at_box": mask_at_box,
            "A": A,
            "big_A": self.big_A,
            "pbw": pbw,
            "tbw": self.tbw,
            "pbounds": pbounds,
            "wbounds": wbounds,
            "tbounds": self.tbounds,
            "R": Rw,
            "Th": Th,
            "H": img.shape[0],
            "W": img.shape[1],
            "coord": coord,
            "latent_index": latent_index,
            "bw_latent_index": bw_latent_index,
            "frame_index": frame_index,
            "cam_ind": cam_ind,
        }


class TPosePDFDataset(_BaseDataset):
    """KNN/displacement dataset (aligned / pdf / sdf families)."""

    def __init__(self, cfg, split: str):
        super().__init__(cfg, split)
        self.weights = np.load(os.path.join(self.lbs_root, "weights.npy")).astype(
            np.float32
        )
        if cfg.get("use_bigpose", False):
            vert_name = "bigpose_vertices.npy"
        else:
            vert_name = "tvertices.npy"
        self.tpose = np.load(os.path.join(self.lbs_root, vert_name)).astype(
            np.float32
        )
        self.tbounds = get_bounds(self.tpose, cfg.box_padding)

        tj = os.path.join(self.lbs_root, "training_joints.npy")
        if (cfg.test_novel_pose or cfg.aninerf_animation) and os.path.exists(tj):
            self.training_joints = np.load(tj)
        else:
            self.training_joints = None

    def nearest_training_frame(self, posed_joints):
        """Nearest training pose for novel-pose latent codes
        (tpose_pdf_dataset.py:176-184)."""
        if self.training_joints is None:
            return None
        d = np.linalg.norm(
            self.training_joints - posed_joints[None], axis=-1
        ).mean(-1)
        return int(d.argmin())

    def prepare_input(self, i):
        wxyz = np.load(
            os.path.join(self.data_root, self.cfg.vertices, f"{i}.npy")
        ).astype(np.float32)
        params = np.load(
            os.path.join(self.data_root, self.cfg.params, f"{i}.npy"),
            allow_pickle=True,
        ).item()
        Rh = params["Rh"].astype(np.float32).reshape(3)
        Th = params["Th"].astype(np.float32).reshape(1, 3)
        R = cv2.Rodrigues(Rh)[0].astype(np.float32)
        pxyz = np.dot(wxyz - Th, R).astype(np.float32)
        poses = params["poses"].reshape(-1, 3).astype(np.float32)
        A, posed_joints = rigid_transforms_host(
            poses, self.joints, self.parents, return_joints=True
        )
        # WORLD-space posed joints: training_joints.npy is written in
        # world coordinates (tpose_pdf_dataset.py:173,
        # tools/prepare_lbs_meta.py), so the nearest-pose lookup must
        # compare in the same frame
        posed_joints = np.asarray(posed_joints) @ R.T + Th
        return (
            wxyz,
            pxyz,
            np.asarray(A).astype(np.float32),
            poses.reshape(-1),
            posed_joints.astype(np.float32),
            Rh,
            Th,
            R,
        )

    def frame_meta(self, index):
        """Per-frame metadata without image IO / ray sampling (see
        TPoseDataset.frame_meta)."""
        frame_index, i = self.frame_index_of(self.ims[index])
        wpts, ppts, A, poses, _, Rh, Th, Rw = self.prepare_input(i)
        return {
            "frame_index": frame_index,
            "A": A,
            "big_A": self.big_A,
            "poses": poses,
            "weights": self.weights,
            "tvertices": self.tpose,
            "pvertices": ppts,
            "pbounds": get_bounds(ppts, self.cfg.box_padding),
            "wbounds": get_bounds(wpts, self.cfg.box_padding),
            "tbounds": self.tbounds,
            "R": Rw,
            "Th": Th,
        }

    def __getitem__(self, index):
        img, msk, orig_msk, K, R, T, cam_ind, img_path = self.load_image(index)
        frame_index, i = self.frame_index_of(img_path)

        wpts, ppts, A, poses, posed_joints, Rh, Th, Rw = self.prepare_input(i)
        pbounds = get_bounds(ppts, self.cfg.box_padding)
        wbounds = get_bounds(wpts, self.cfg.box_padding)

        rgb, ray_o, ray_d, near, far, coord, mask_at_box = self.sample_rays(
            img, msk, K, R, T, wbounds
        )
        if self.cfg.erode_edge:
            orig_msk = crop_mask_edge(orig_msk)
        occupancy = orig_msk[coord[:, 0], coord[:, 1]]

        latent_index, bw_latent_index = self.latent_indices(index)
        if self.cfg.test_novel_pose and self.training_joints is not None:
            nearest = self.nearest_training_frame(posed_joints)
            if nearest is not None:
                latent_index = nearest

        return {
            "rgb": rgb,
            "occupancy": occupancy,
            "ray_o": ray_o,
            "ray_d": ray_d,
            "near": near,
            "far": far,
            "mask_at_box": mask_at_box,
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
            "H": img.shape[0],
            "W": img.shape[1],
            "coord": coord,
            "latent_index": latent_index,
            "bw_latent_index": bw_latent_index,
            "frame_index": frame_index,
            "cam_ind": cam_ind,
        }
