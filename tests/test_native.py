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


@needs_native
class TestRasterizeMesh:
    def _cam(self, H, W):
        K = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
        return K, np.eye(3, dtype=np.float32), np.zeros(3, np.float32)

    def test_single_triangle_coverage_and_interp(self):
        from animatable_nerf_tpu.native import rasterize_mesh_native

        H = W = 64
        K, R, T = self._cam(H, W)
        verts = np.array(
            [[-0.5, -0.5, 2.0], [0.5, -0.5, 2.0], [0.0, 0.5, 2.0]],
            np.float32,
        )
        faces = np.array([[0, 1, 2]], np.int64)
        attrs = np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]], np.float32)
        out = rasterize_mesh_native(verts, faces, attrs, K, R, T, H, W)
        assert out["mask"].sum() > 100
        # centroid pixel interpolates to ~(1/3, 1/3)
        cy, cx = H // 2 - 3, W // 2  # inside the triangle
        assert out["mask"][cy, cx]
        assert abs(float(out["depth"][cy, cx]) - 2.0) < 1e-3
        # attrs bounded by barycentric hull
        a = out["attr"][out["mask"] > 0]
        assert (a >= -1e-4).all() and (a.sum(-1) <= 1 + 1e-4).all()

    def test_depth_occlusion(self):
        from animatable_nerf_tpu.native import rasterize_mesh_native

        H = W = 32
        K, R, T = self._cam(H, W)
        # two overlapping triangles at different depths
        near = np.array(
            [[-0.4, -0.4, 1.0], [0.4, -0.4, 1.0], [0.0, 0.4, 1.0]],
            np.float32,
        )
        far = near.copy()
        far[:, 2] = 3.0
        verts = np.concatenate([far, near])
        faces = np.array([[0, 1, 2], [3, 4, 5]], np.int64)
        attrs = np.array([[0.0]] * 3 + [[1.0]] * 3, np.float32)
        out = rasterize_mesh_native(verts, faces, attrs, K, R, T, H, W)
        cy, cx = H // 2 - 2, W // 2
        assert float(out["attr"][cy, cx, 0]) == pytest.approx(1.0, abs=1e-4)
        assert float(out["depth"][cy, cx]) == pytest.approx(1.0, abs=1e-3)
