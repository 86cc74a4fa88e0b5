"""Datasets for the image-space baselines (NHR / NT).

Reference: lib/datasets/h36m/nhr.py (full-image target + posed-SMPL
metadata for point rendering) and lib/datasets/h36m/nt.py (full-image
target + precomputed SMPL UV renders).

Batch key deviations from the reference, by design of our modules:
  * `RT` is the (3, 4) world->camera matrix [R|T] (our rasterizer
    projects world->cam; the reference passes the inverse because PCPR
    expects cam->world).
  * images are channels-last (H, W, 3).
"""

from __future__ import annotations

import os

import numpy as np

from ..core.rays import get_bound_2d_mask
from ..core.skeleton import rigid_transforms
from .dataset import _BaseDataset
from .utils import get_bounds


class NHRDataset(_BaseDataset):
    """Full-image dataset for the NHR point-rendering baseline
    (h36m/nhr.py:71-180)."""

    def __init__(self, cfg, split: str):
        super().__init__(cfg, split)
        self.tpose = np.load(
            os.path.join(self.lbs_root, "bigpose_vertices.npy")
        ).astype(np.float32)
        self.tbounds = get_bounds(self.tpose, cfg.box_padding)
        self.tbw = np.load(
            os.path.join(self.lbs_root, "bigpose_bw.npy")
        ).astype(np.float32)

    def prepare_pose(self, frame_file_index):
        """(wxyz, A, big_A, R, Th) for one frame (h36m/nhr.py:71-104)."""
        cfg = self.cfg
        vertices_path = os.path.join(
            self.data_root, cfg.vertices, f"{frame_file_index}.npy"
        )
        wxyz = np.load(vertices_path).astype(np.float32)
        params = np.load(
            os.path.join(self.data_root, cfg.params, f"{frame_file_index}.npy"),
            allow_pickle=True,
        ).item()
        import cv2

        Rh = np.asarray(params["Rh"], np.float32).reshape(3)
        Th = np.asarray(params["Th"], np.float32).reshape(1, 3)
        R = cv2.Rodrigues(Rh)[0].astype(np.float32)
        poses = np.asarray(params["poses"]).reshape(-1, 3).astype(np.float32)
        A = np.asarray(
            rigid_transforms(poses[:24], self.joints, self.parents)
        ).astype(np.float32)
        return wxyz, A, self.big_A, R, Th

    def __getitem__(self, index):
        img, msk, orig_msk, K, R_cam, T_cam, cam_ind, img_path = (
            self.load_image(index)
        )
        frame_index, file_index = self.frame_index_of(img_path)
        wxyz, A, big_A, R, Th = self.prepare_pose(file_index)
        wbounds = get_bounds(wxyz, self.cfg.box_padding)
        H, W = img.shape[:2]
        pose = np.concatenate([R_cam, T_cam], axis=1)
        mask_at_box = get_bound_2d_mask(wbounds, K, pose, H, W)
        RT = np.concatenate([R_cam, T_cam], axis=1).astype(np.float32)
        latent_index, _ = self.latent_indices(index)
        return {
            "img": img.astype(np.float32),
            "msk": msk.astype(np.float32),
            "K": K.astype(np.float32),
            "RT": RT,
            "mask_at_box": mask_at_box.astype(bool),
            "A": A,
            "big_A": big_A,
            "R": R,
            "Th": Th,
            "tpose": self.tpose,
            "tbw": self.tbw,
            "tbounds": self.tbounds,
            "wbounds": wbounds,
            "latent_index": np.asarray(latent_index, np.int32),
            "frame_index": np.asarray(frame_index, np.int32),
            "cam_ind": np.asarray(cam_ind, np.int32),
        }


class NTDataset(_BaseDataset):
    """Full-image dataset for the Neural Texture baseline: target image
    + precomputed SMPL UV render `uv/<frame>_<cam>.npy` (h36m/nt.py)."""

    def __init__(self, cfg, split: str):
        super().__init__(cfg, split)
        self.uv_dir = os.path.join(self.data_root, "uv")

    def load_uv(self, frame_file_index, cam_ind, H, W):
        path = os.path.join(
            self.uv_dir, f"{frame_file_index}_{cam_ind}.npy"
        )
        uv = np.load(path).astype(np.float32)
        if uv.shape[:2] != (H, W):
            import cv2

            uv = cv2.resize(uv, (W, H), interpolation=cv2.INTER_LINEAR)
        msk = (np.abs(uv).sum(-1) > 0).astype(np.float32)
        return uv[..., :2], msk

    def __getitem__(self, index):
        img, msk, orig_msk, K, R_cam, T_cam, cam_ind, img_path = (
            self.load_image(index)
        )
        frame_index, file_index = self.frame_index_of(img_path)
        H, W = img.shape[:2]
        uv, uv_msk = self.load_uv(file_index, cam_ind, H, W)
        return {
            "img": img.astype(np.float32),
            "msk": msk.astype(np.float32),
            "uv": uv,
            "uv_msk": uv_msk,
            "mask_at_box": (msk > 0),
            "frame_index": np.asarray(frame_index, np.int32),
            "cam_ind": np.asarray(cam_ind, np.int32),
        }
