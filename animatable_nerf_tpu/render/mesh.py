"""Mesh extraction: jitted field sweeps over dense voxel grids + host-side
isosurface extraction.

Reference: lib/networks/renderer/aninerf_mesh_renderer.py (density
marching cubes at cfg.mesh_th) and sdf_mesh_renderer.py (canonical SDF at
level 0, then re-posing). The reference calls PyMCubes; this module ships
a dependency-free vectorized marching-tetrahedra extractor (same
isosurface, denser tessellation). The fast path is the in-tree C++
implementation of the same algorithm (csrc/mesh_native.cpp, loaded via
animatable_nerf_tpu/native.py) — `marching_cubes` dispatches to it
automatically and falls back to the numpy twin.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def density_grid_sweep(field_fn, pts, tile: int = 65536):
    """Evaluate `field_fn((N,3)) -> (N,)` over a flattened point grid as a
    lax.map of fixed-size tiles inside one jitted program.

    pts: (N, 3) — padded internally to a tile multiple.
    """
    n = pts.shape[0]
    n_pad = int(np.ceil(n / tile) * tile)
    pts_p = jnp.pad(pts, ((0, n_pad - n), (0, 0)))
    chunks = pts_p.reshape(-1, tile, 3)
    vals = jax.lax.map(field_fn, chunks)
    return vals.reshape(-1)[:n]


# ---- marching tetrahedra ----------------------------------------------
# each cube is split into 6 tetrahedra around the 0-7 diagonal (vertex
# indices into the cube's 8 corners, corner k at offset
# (k>>2 & 1, k>>1 & 1, k & 1))
_TETS = np.array(
    [
        [0, 1, 3, 7],
        [0, 1, 7, 5],
        [0, 5, 7, 4],
        [0, 4, 7, 6],
        [0, 6, 7, 2],
        [0, 2, 7, 3],
    ]
)

_CORNER_OFFSETS = np.array(
    [[(k >> 2) & 1, (k >> 1) & 1, k & 1] for k in range(8)]
)

# per sign-case triangle recipes for a tetrahedron with vertices (a,b,c,d):
# key = bitmask of "inside" vertices; value = list of triangles, each
# triangle a list of 3 edges, each edge a (inside_vertex, outside_vertex)
# pair whose crossing point is interpolated.
_TET_CASES = {}
for case in range(1, 15):
    inside = [i for i in range(4) if case & (1 << i)]
    outside = [i for i in range(4) if not case & (1 << i)]
    if len(inside) == 1:
        a = inside[0]
        e = [(a, o) for o in outside]
        _TET_CASES[case] = [[e[0], e[1], e[2]]]
    elif len(inside) == 3:
        a = outside[0]
        e = [(i, a) for i in inside]
        _TET_CASES[case] = [[e[0], e[2], e[1]]]
    else:  # 2 in / 2 out -> quad -> 2 triangles
        i0, i1 = inside
        o0, o1 = outside
        e00, e01 = (i0, o0), (i0, o1)
        e10, e11 = (i1, o0), (i1, o1)
        _TET_CASES[case] = [[e00, e01, e11], [e00, e11, e10]]


def marching_cubes(volume: np.ndarray, level: float, spacing=(1.0, 1.0, 1.0),
                   origin=(0.0, 0.0, 0.0), native: bool = True):
    """Extract the isosurface {volume == level} from a (D, H, W) scalar
    grid. Returns (vertices (V, 3) float32, faces (F, 3) int64).

    Dispatches to the C++ extractor (csrc/mesh_native.cpp) when built;
    otherwise runs the vectorized numpy marching tetrahedra below
    (all cubes processed with broadcasting; vertices deduplicated on
    quantized edge keys).
    """
    if native:
        from ..native import marching_cubes_native

        out = marching_cubes_native(volume, level, spacing, origin)
        if out is not None:
            return out
    vol = np.asarray(volume, dtype=np.float64)
    D, H, W = vol.shape
    if min(D, H, W) < 2:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    # corner samples for every cube: (D-1, H-1, W-1, 8)
    idx = _CORNER_OFFSETS
    corners = np.stack(
        [
            vol[dx : dx + D - 1, dy : dy + H - 1, dz : dz + W - 1]
            for dx, dy, dz in idx
        ],
        axis=-1,
    )
    base = np.stack(
        np.meshgrid(
            np.arange(D - 1), np.arange(H - 1), np.arange(W - 1), indexing="ij"
        ),
        axis=-1,
    ).reshape(-1, 3)
    vals = corners.reshape(-1, 8)

    # skip cubes with no crossing
    inside8 = vals > level
    active = inside8.any(-1) & (~inside8.all(-1))
    base = base[active]
    vals = vals[active]
    if base.size == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    verts_chunks = []
    for tet in _TETS:
        tvals = vals[:, tet]  # (C, 4)
        tpos = base[:, None, :] + idx[tet][None]  # (C, 4, 3)
        case = ((tvals > level) << np.arange(4)).sum(-1)  # (C,)
        for c, tris in _TET_CASES.items():
            sel = case == c
            if not sel.any():
                continue
            sv, sp = tvals[sel], tpos[sel]
            for tri in tris:
                pts3 = []
                for (a, b) in tri:
                    va, vb = sv[:, a], sv[:, b]
                    t = (level - va) / (vb - va)
                    p = sp[:, a] + t[:, None] * (sp[:, b] - sp[:, a])
                    pts3.append(p)
                verts_chunks.append(np.stack(pts3, axis=1))  # (n, 3, 3)

    if not verts_chunks:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int64)

    tris = np.concatenate(verts_chunks, axis=0)  # (F, 3, 3) grid coords
    flat = tris.reshape(-1, 3)
    # dedupe vertices (quantize to kill fp jitter)
    keys = np.round(flat * 1e6).astype(np.int64)
    uniq, inv = np.unique(keys, axis=0, return_inverse=True)
    # representative positions: first occurrence of each unique key
    first = np.full(len(uniq), len(flat), dtype=np.int64)
    np.minimum.at(first, inv, np.arange(len(flat)))
    verts = flat[first]
    faces = inv.reshape(-1, 3)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]

    verts = verts * np.asarray(spacing)[None] + np.asarray(origin)[None]
    return verts.astype(np.float32), faces.astype(np.int64)


def largest_component(verts: np.ndarray, faces: np.ndarray):
    """Keep the largest connected component (sdf_mesh_renderer keeps the
    biggest mesh via trimesh splitting — reference :77-80)."""
    if len(faces) == 0:
        return verts, faces
    import scipy.sparse as sp
    import scipy.sparse.csgraph as csgraph

    n = len(verts)
    e = np.concatenate([faces[:, [0, 1]], faces[:, [1, 2]], faces[:, [2, 0]]])
    adj = sp.coo_matrix(
        (np.ones(len(e)), (e[:, 0], e[:, 1])), shape=(n, n)
    )
    ncomp, labels = csgraph.connected_components(adj, directed=False)
    if ncomp <= 1:
        return verts, faces
    counts = np.bincount(labels)
    keep = counts.argmax()
    vmask = labels == keep
    remap = -np.ones(n, dtype=np.int64)
    remap[vmask] = np.arange(vmask.sum())
    fmask = vmask[faces].all(-1)
    return verts[vmask], remap[faces[fmask]]


def vertex_normals(verts: np.ndarray, faces: np.ndarray) -> np.ndarray:
    """Area-weighted per-vertex normals (numpy, host-side: used to shade
    mesh preview rasters, run.py --type raster). Cross products of the
    face edges accumulate un-normalized (magnitude = 2x face area) so
    larger faces weigh more, then each vertex normal is normalized."""
    vn = np.zeros_like(verts, dtype=np.float64)
    if len(faces) == 0:
        return vn.astype(np.float32)
    tri = verts[faces]  # (F, 3, 3)
    fn = np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0])
    for k in range(3):
        np.add.at(vn, faces[:, k], fn)
    norm = np.linalg.norm(vn, axis=-1, keepdims=True)
    return (vn / np.maximum(norm, 1e-12)).astype(np.float32)
