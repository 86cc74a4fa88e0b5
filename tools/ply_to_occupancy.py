"""Point-cloud .ply -> compressed occupancy voxel grids.

Mirrors lib/utils/light_stage/ply_to_occupancy.py: per frame, normalize
the cloud into the unit cube, mark the NEAREST grid cell of each point
on a 256^3 grid over [-0.5, 0.5], and write
`voxel/<human>/<i>.npz {compressed_occupancies (packbits), bounds}`.

The reference does the nearest-cell assignment with a scipy cKDTree
over all 16.7M grid points; here it is exact rounding into cell
indices, executed by the native C++ voxelizer when built
(csrc/mesh_native.cpp `voxelize_occupancy`) with a numpy fallback.

Usage: python tools/ply_to_occupancy.py --data_root data/light_stage
"""

from __future__ import annotations

import argparse
import os
import struct
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

RES = 256
BB_MIN, BB_MAX = -0.5, 0.5


def load_ply(path: str) -> np.ndarray:
    """Minimal PLY vertex reader (ascii / binary_little_endian),
    returning (N, 3) float xyz. Replaces lib/utils/data_utils.load_ply
    (which used plyfile)."""
    with open(path, "rb") as f:
        if f.readline().strip() != b"ply":
            raise ValueError(f"not a ply file: {path}")
        fmt = None
        n_verts = 0
        props = []
        in_vertex = False
        while True:
            line = f.readline().strip()
            if line.startswith(b"format"):
                fmt = line.split()[1].decode()
            elif line.startswith(b"element"):
                _, name, cnt = line.split()[:3]
                in_vertex = name == b"vertex"
                if in_vertex:
                    n_verts = int(cnt)
            elif line.startswith(b"property") and in_vertex:
                parts = line.split()
                props.append((parts[-1].decode(), parts[1].decode()))
            elif line == b"end_header":
                break

        type_map = {
            "float": ("f", 4), "float32": ("f", 4),
            "double": ("d", 8), "float64": ("d", 8),
            "uchar": ("B", 1), "uint8": ("B", 1),
            "char": ("b", 1), "int8": ("b", 1),
            "short": ("h", 2), "ushort": ("H", 2),
            "int": ("i", 4), "int32": ("i", 4),
            "uint": ("I", 4), "uint32": ("I", 4),
        }
        if fmt == "ascii":
            data = np.loadtxt(f, max_rows=n_verts, dtype=np.float64)
            names = [n for n, _ in props]
            xyz_cols = [names.index(c) for c in ("x", "y", "z")]
            return data[:, xyz_cols].astype(np.float32)

        if fmt != "binary_little_endian":
            raise ValueError(f"unsupported ply format {fmt}")
        dt = np.dtype(
            [(n, "<" + type_map[t][0]) for n, t in props]
        )
        arr = np.frombuffer(f.read(dt.itemsize * n_verts), dtype=dt,
                            count=n_verts)
        return np.stack(
            [arr["x"], arr["y"], arr["z"]], axis=1
        ).astype(np.float32)


def get_scaled_model(model: np.ndarray):
    """Center + scale to the unit cube (ply_to_occupancy.py:11-18)."""
    mn, mx = model.min(0), model.max(0)
    bounds = np.stack([mn, mx], axis=0)
    center = (mn + mx) / 2
    scale = np.max(mx - mn)
    return (model - center) / scale, bounds


def voxelize(model: np.ndarray) -> np.ndarray:
    """Nearest-grid-cell occupancy on the RES^3 grid over
    [BB_MIN, BB_MAX] (== the reference's KDTree-nearest assignment),
    packbits-compressed."""
    step = (BB_MAX - BB_MIN) / (RES - 1)
    # nearest grid point == floor into cells whose edges sit half a step
    # below each grid point
    bounds6 = np.array(
        [BB_MIN - step / 2] * 3 + [BB_MAX + step / 2] * 3, np.float32
    )
    from animatable_nerf_tpu.native import voxelize_occupancy_native

    grid = voxelize_occupancy_native(
        model, bounds6.reshape(2, 3), (RES, RES, RES)
    )
    if grid is None:  # no native toolchain: numpy fallback
        idx = np.round((model - BB_MIN) / step).astype(np.int64)
        ok = ((idx >= 0) & (idx < RES)).all(1)
        idx = idx[ok]
        grid = np.zeros((RES, RES, RES), np.uint8)
        grid[idx[:, 0], idx[:, 1], idx[:, 2]] = 1
    return np.packbits(grid.reshape(-1).astype(np.int8))


def ply_to_occupancy(data_root: str):
    pc_dir = os.path.join(data_root, "point_cloud")
    voxel_dir = os.path.join(data_root, "voxel")
    for human in sorted(os.listdir(pc_dir)):
        src = os.path.join(pc_dir, human)
        dst = os.path.join(voxel_dir, human)
        os.makedirs(dst, exist_ok=True)
        for name in sorted(os.listdir(src)):
            if not name.endswith(".ply"):
                continue
            model = load_ply(os.path.join(src, name))
            model, bounds = get_scaled_model(model)
            packed = voxelize(model)
            i = int(name.split(".")[0])
            np.savez(
                os.path.join(dst, f"{i}.npz"),
                compressed_occupancies=packed,
                bounds=bounds,
            )
        print(f"voxelized {human} -> {dst}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_root", default="data/light_stage")
    args = ap.parse_args(argv)
    ply_to_occupancy(args.data_root)


if __name__ == "__main__":
    main()
