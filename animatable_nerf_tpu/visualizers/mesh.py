"""Mesh visualizer: .ply + raw .npy dumps of extracted meshes.

Reference: lib/visualizers/mesh_visualizer.py:16-42 (t-pose/posed mesh
export under data/animation/<exp>)."""

from __future__ import annotations

import os

import numpy as np

from ..evaluators.mesh import export_ply


class MeshVisualizer:
    def __init__(self, exp_name: str, out_root: str = "data/animation"):
        self.dir = os.path.join(out_root, exp_name)

    def visualize(self, verts, faces, frame_index: int, posed: bool = True):
        sub = "posed_mesh" if posed else "tpose_mesh"
        path = os.path.join(self.dir, sub, f"{frame_index:04d}.ply")
        export_ply(path, verts, faces)
        np.save(
            os.path.join(self.dir, sub, f"{frame_index:04d}.npy"),
            {"vertex": verts, "triangle": faces},
        )
        return path
