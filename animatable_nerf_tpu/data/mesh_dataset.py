"""Mesh-extraction datasets: dense voxel query grids over the subject
bounds plus a multi-view visibility mask.

Reference: lib/datasets/aninerf_mesh_dataset.py:100-156 (world-space grid
at cfg.voxel_size + `prepare_inside_pts` projecting grid points into
every training-view mask) and anisdf_mesh_dataset.py (canonical-space
grid for SDF models).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from .novel_view import _GridFrameMixin, _PDFFrameMixin, _VisMixin
from .dataset import _imread_rgb


def grid_points(bounds, voxel_size):
    """Dense meshgrid over bounds (aninerf_mesh_dataset.py:144-156).

    Steps stay PYTHON floats so np.arange runs in float32 exactly like
    the reference (f32 bounds + weak-scalar step); an f64 step promotes
    the accumulation and shifts grid nodes by ~4e-7 (golden data test).
    """
    vs = [float(v) for v in np.asarray(voxel_size).ravel()]
    x = np.arange(bounds[0, 0], bounds[1, 0] + vs[0], vs[0])
    y = np.arange(bounds[0, 1], bounds[1, 1] + vs[1], vs[1])
    z = np.arange(bounds[0, 2], bounds[1, 2] + vs[2], vs[2])
    return np.stack(np.meshgrid(x, y, z, indexing="ij"), axis=-1).astype(
        np.float32
    )


def _make_mesh_dataset(base_cls, canonical: bool):
    class _Mesh(base_cls, _VisMixin):
        def __init__(self, cfg, split="test"):
            super().__init__(cfg, split)
            # one item per test frame: track both the filename-embedded
            # file id (for params/bweights IO) and the annots POSITION
            # (for the per-frame training-view mask table)
            n_frames = len(self.ims) // self.num_cams
            name_to_pos = {}
            for pos, entry in enumerate(self.annots_ims):
                for nm in entry["ims"]:
                    name_to_pos[nm] = pos
            self.frame_ids = []
            self.frame_positions = []
            for k in range(n_frames):
                name = self.ims[k * self.num_cams]
                self.frame_ids.append(
                    self.frame_index_of(os.path.join(self.data_root, name))[1]
                )
                self.frame_positions.append(name_to_pos[name])
            # one item per frame from here on: FrameSampler divides
            # len(dataset) by num_cams (loader.py), so mirror the
            # reference's reset (aninerf_mesh_dataset.py:45 num_cams=1)
            self.num_cams = 1

        def __len__(self):
            return len(self.frame_ids)

        def __getitem__(self, index):
            i = self.frame_ids[index]
            annot_pos = self.frame_positions[index]
            item = self._frame_item(i, annot_pos)
            bounds = item["tbounds"] if canonical else item["wbounds"]
            pts = grid_points(bounds, self.cfg.voxel_size)
            item["pts"] = pts
            item["frame_index"] = i

            img0 = _imread_rgb(os.path.join(self.data_root, self.ims[0]))
            H, W = img0.shape[:2]
            H, W = int(H * self.cfg.ratio), int(W * self.cfg.ratio)
            item["msks"] = self._train_view_masks(annot_pos, H, W)
            Ks, RTs = self._vis_cams(H, W)
            item["Ks"] = Ks
            item["RT"] = RTs
            item["voxel_size"] = np.asarray(self.cfg.voxel_size, np.float32)
            return item

    return _Mesh


MeshDataset = _make_mesh_dataset(_GridFrameMixin, canonical=False)
SDFMeshDataset = _make_mesh_dataset(_PDFFrameMixin, canonical=True)
PDFMeshDataset = _make_mesh_dataset(_PDFFrameMixin, canonical=False)
