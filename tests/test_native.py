"""Native (C++) mesh ops vs their numpy twins (csrc/mesh_native.cpp)."""

import numpy as np
import pytest

from animatable_nerf_tpu.native import (
    mesh_native,
    marching_cubes_native,
    voxelize_occupancy_native,
)
from animatable_nerf_tpu.render.mesh import marching_cubes

needs_native = pytest.mark.skipif(
    mesh_native() is None, reason="no C++ toolchain"
)


def _sphere_volume(n=24, r=0.6):
    g = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    return (r - np.sqrt(x**2 + y**2 + z**2)).astype(np.float32)


@needs_native
class TestMarchingTetsNative:
    def test_sphere_matches_python_twin(self):
        vol = _sphere_volume()
        nv, nf = marching_cubes_native(vol, 0.0)
        pv, pf = marching_cubes(vol, 0.0, native=False)
        # same triangle soup after dedup: identical counts and vertex sets
        assert len(nf) == len(pf)
        nset = set(map(tuple, np.round(nv, 5).tolist()))
        pset = set(map(tuple, np.round(pv, 5).tolist()))
        assert nset == pset

    def test_sphere_radius(self):
        vol = _sphere_volume(n=48)
        spacing = (2.0 / 47,) * 3
        verts, faces = marching_cubes_native(
            vol, 0.0, spacing=spacing, origin=(-1.0, -1.0, -1.0)
        )
        radii = np.linalg.norm(verts, axis=-1)
        assert abs(radii.mean() - 0.6) < 0.01
        assert radii.std() < 0.01
        assert len(faces) > 100

    def test_empty_volume(self):
        vol = -np.ones((8, 8, 8), np.float32)
        verts, faces = marching_cubes_native(vol, 0.0)
        assert len(verts) == 0 and len(faces) == 0

    def test_dispatch_from_render_mesh(self):
        vol = _sphere_volume()
        v1, f1 = marching_cubes(vol, 0.0, native=True)
        assert len(f1) > 0


@needs_native
class TestVoxelizeNative:
    def test_binning(self):
        pts = np.array(
            [[0.05, 0.05, 0.05], [0.95, 0.95, 0.95], [0.5, 0.5, 0.5]],
            np.float32,
        )
        bounds = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
        grid = voxelize_occupancy_native(pts, bounds, (10, 10, 10))
        assert grid[0, 0, 0] == 1
        assert grid[9, 9, 9] == 1
        assert grid[5, 5, 5] == 1
        assert grid.sum() == 3

    def test_out_of_bounds_ignored(self):
        pts = np.array([[2.0, 2.0, 2.0], [-1.0, 0.5, 0.5]], np.float32)
        bounds = np.array([[0, 0, 0], [1, 1, 1]], np.float32)
        grid = voxelize_occupancy_native(pts, bounds, (4, 4, 4))
        assert grid.sum() == 0
