"""Trilinear voxel-grid sampling with PyTorch `grid_sample` semantics
(align_corners=True, padding_mode='border').

Reference semantics: lib/utils/blend_utils.py:119-149
(`pts_sample_blend_weights`). The reference normalizes points into the
volume bounds, flips xyz->zyx and calls F.grid_sample on a (B, 25, D, H, W)
volume; the net effect is that volume axis 0 (D) is indexed by x, axis 1
(H) by y and axis 2 (W) by z. We implement that mapping directly on a
channels-last (D, H, W, C) volume — no permutes, no flips, and the gather
is expressed as a flat 1-D take that XLA lowers to an efficient dynamic
gather on TPU.
"""

from __future__ import annotations

import jax.numpy as jnp


def grid_trilerp(vol: jnp.ndarray, pts01: jnp.ndarray) -> jnp.ndarray:
    """Sample `vol` (D, H, W, C) at normalized points (..., 3) in [0, 1].

    Coordinates outside [0, 1] clamp to the border (grid_sample
    padding_mode='border'); coordinate c in [0,1] maps to voxel index
    c * (size - 1) (align_corners=True). pts01[..., 0] indexes axis D,
    [..., 1] axis H, [..., 2] axis W.
    """
    D, H, W, C = vol.shape
    sizes = jnp.array([D, H, W], dtype=pts01.dtype)
    idx = pts01 * (sizes - 1.0)
    idx = jnp.clip(idx, 0.0, sizes - 1.0)

    i0 = jnp.floor(idx)
    frac = idx - i0
    i0 = i0.astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, jnp.array([D - 1, H - 1, W - 1], dtype=jnp.int32))

    x0, y0, z0 = i0[..., 0], i0[..., 1], i0[..., 2]
    x1, y1, z1 = i1[..., 0], i1[..., 1], i1[..., 2]
    fx, fy, fz = frac[..., 0:1], frac[..., 1:2], frac[..., 2:3]

    flat = vol.reshape(-1, C)

    def take(xi, yi, zi):
        lin = (xi * H + yi) * W + zi
        return jnp.take(flat, lin, axis=0)

    c000 = take(x0, y0, z0)
    c001 = take(x0, y0, z1)
    c010 = take(x0, y1, z0)
    c011 = take(x0, y1, z1)
    c100 = take(x1, y0, z0)
    c101 = take(x1, y0, z1)
    c110 = take(x1, y1, z0)
    c111 = take(x1, y1, z1)

    c00 = c000 * (1 - fz) + c001 * fz
    c01 = c010 * (1 - fz) + c011 * fz
    c10 = c100 * (1 - fz) + c101 * fz
    c11 = c110 * (1 - fz) + c111 * fz
    c0 = c00 * (1 - fy) + c01 * fy
    c1 = c10 * (1 - fy) + c11 * fy
    return c0 * (1 - fx) + c1 * fx


def pack_corner_volume(vol: jnp.ndarray) -> jnp.ndarray:
    """Redundant corner-packed layout for fast trilerp gathers.

    Returns a (D-1, H-1, W-1, 8*C) volume whose cell (x, y, z) holds the
    channels of all 8 corners of that cell, in the order
    (0,0,0),(0,0,1),(0,1,0),(0,1,1),(1,0,0),(1,0,1),(1,1,0),(1,1,1).

    Why: XLA's TPU gather is serialized per gathered row, so the classic
    8-corner trilerp pays 8x the row count — it is the #1 cost of the
    whole eval render (measured by in-situ ablation: ~60% of the step).
    Packing trades 8x volume memory (a few tens of MB) for a single
    gathered row per query point.
    """
    D, H, W, C = vol.shape
    parts = []
    for dx in (0, 1):
        for dy in (0, 1):
            for dz in (0, 1):
                parts.append(
                    vol[dx : D - 1 + dx, dy : H - 1 + dy, dz : W - 1 + dz]
                )
    return jnp.concatenate(parts, axis=-1)


def grid_trilerp_packed(packed: jnp.ndarray, pts01: jnp.ndarray,
                        n_channels: int) -> jnp.ndarray:
    """Trilerp from a `pack_corner_volume` layout: ONE gather per point.

    `pts01` is normalized to the ORIGINAL (D, H, W) grid
    (same convention as grid_trilerp); `n_channels` is the original C.
    """
    Dm, Hm, Wm, _ = packed.shape  # = D-1, H-1, W-1
    C = n_channels
    batch_shape = pts01.shape[:-1]
    p = pts01.reshape(-1, 3)
    sizes = jnp.array([Dm + 1, Hm + 1, Wm + 1], dtype=p.dtype)
    idx = jnp.clip(p * (sizes - 1.0), 0.0, sizes - 1.0)
    i0 = jnp.minimum(
        jnp.floor(idx).astype(jnp.int32),
        jnp.array([Dm - 1, Hm - 1, Wm - 1], jnp.int32),
    )
    frac = idx - i0.astype(idx.dtype)

    lin = (i0[:, 0] * Hm + i0[:, 1]) * Wm + i0[:, 2]
    g = jnp.take(packed.reshape(-1, 8 * C), lin, axis=0)  # (N, 8C)

    fx, fy, fz = frac[:, 0:1], frac[:, 1:2], frac[:, 2:3]
    weights = (
        (1 - fx) * (1 - fy) * (1 - fz), (1 - fx) * (1 - fy) * fz,
        (1 - fx) * fy * (1 - fz), (1 - fx) * fy * fz,
        fx * (1 - fy) * (1 - fz), fx * (1 - fy) * fz,
        fx * fy * (1 - fz), fx * fy * fz,
    )
    # weighted corner sum via lane slices — reshaping to (N, 8, C) would
    # pad C up to a full 128-lane tile (5x memory) on TPU
    out = weights[0] * g[:, :C]
    for k in range(1, 8):
        out = out + weights[k] * g[:, k * C : (k + 1) * C]
    return out.reshape(*batch_shape, C)


def grid_corner_distance_bound(packed, pts01, cell):
    """Certified lower bound of a 1-Lipschitz distance field from its
    corner-packed grid: max over the cell's 8 corners of
    d(corner)*(1 - 2^-7) - |x - corner|.

    Strictly tighter than trilerp-minus-half-diagonal (the bound is
    EXACT at grid nodes and degrades only with distance to the nearest
    corner, vs the uniform half-cell-diagonal margin): measured
    conservative keep 20.8% vs 24.0% at the representative SDF eval
    scene (exact 19.2%, res 64, th 0.1). Validity: d is 1-Lipschitz so
    d(x) >= d(c_i) - |x - c_i| for every corner; the (1 - 2^-7) factor
    absorbs bf16 corner round-off (RTNE rel error <= 2^-8, 2x headroom).
    For points whose pts01 clamps into the grid the caller must subtract
    the clamp excess |x - clamp(x)| (d(x) >= d(clamp(x)) - excess).

    packed: (res-1,)^3 x 8 corner-packed scalar field
    (pack_corner_volume order). cell: (3,) cell edge lengths.
    Returns (N,) f32 lower bounds.
    """
    Dm, Hm, Wm, _ = packed.shape
    p = pts01.reshape(-1, 3)
    sizes = jnp.array([Dm + 1, Hm + 1, Wm + 1], dtype=p.dtype)
    idx = jnp.clip(p * (sizes - 1.0), 0.0, sizes - 1.0)
    i0 = jnp.minimum(
        jnp.floor(idx).astype(jnp.int32),
        jnp.array([Dm - 1, Hm - 1, Wm - 1], jnp.int32),
    )
    frac = idx - i0.astype(idx.dtype)
    lin = (i0[:, 0] * Hm + i0[:, 1]) * Wm + i0[:, 2]
    g = jnp.take(packed.reshape(-1, 8), lin, axis=0).astype(jnp.float32)

    fx = frac[:, 0] * cell[0]
    fy = frac[:, 1] * cell[1]
    fz = frac[:, 2] * cell[2]
    gx = cell[0] - fx
    gy = cell[1] - fy
    gz = cell[2] - fz
    x2, y2, z2 = fx * fx, fy * fy, fz * fz
    X2, Y2, Z2 = gx * gx, gy * gy, gz * gz
    scale = jnp.float32(1.0 - 2.0 ** -7)
    lb = None
    # corner order matches pack_corner_volume: dx-major, then dy, dz
    for k, (ax, ay, az) in enumerate(
        [(x2, y2, z2), (x2, y2, Z2), (x2, Y2, z2), (x2, Y2, Z2),
         (X2, y2, z2), (X2, y2, Z2), (X2, Y2, z2), (X2, Y2, Z2)]
    ):
        r = jnp.sqrt(ax + ay + az)
        b = g[:, k] * scale - r
        lb = b if lb is None else jnp.maximum(lb, b)
    return lb.reshape(pts01.shape[:-1])


def grid_corner_distance_upper(packed, pts01, cell):
    """Certified UPPER bound of a 1-Lipschitz field from its
    corner-packed grid: min over the cell's 8 corners of
    d(corner)*(1 + 2^-7) + |x - corner| (dual of
    grid_corner_distance_bound; the (1 + 2^-7) factor absorbs bf16
    corner round-off). For clamped out-of-grid points the caller must
    ADD the clamp excess (d(x) <= d(clamp(x)) + excess).
    """
    Dm, Hm, Wm, _ = packed.shape
    p = pts01.reshape(-1, 3)
    sizes = jnp.array([Dm + 1, Hm + 1, Wm + 1], dtype=p.dtype)
    idx = jnp.clip(p * (sizes - 1.0), 0.0, sizes - 1.0)
    i0 = jnp.minimum(
        jnp.floor(idx).astype(jnp.int32),
        jnp.array([Dm - 1, Hm - 1, Wm - 1], jnp.int32),
    )
    frac = idx - i0.astype(idx.dtype)
    lin = (i0[:, 0] * Hm + i0[:, 1]) * Wm + i0[:, 2]
    g = jnp.take(packed.reshape(-1, 8), lin, axis=0).astype(jnp.float32)

    fx = frac[:, 0] * cell[0]
    fy = frac[:, 1] * cell[1]
    fz = frac[:, 2] * cell[2]
    gx = cell[0] - fx
    gy = cell[1] - fy
    gz = cell[2] - fz
    x2, y2, z2 = fx * fx, fy * fy, fz * fz
    X2, Y2, Z2 = gx * gx, gy * gy, gz * gz
    scale = jnp.float32(1.0 + 2.0 ** -7)
    ub = None
    for k, (ax, ay, az) in enumerate(
        [(x2, y2, z2), (x2, y2, Z2), (x2, Y2, z2), (x2, Y2, Z2),
         (X2, y2, z2), (X2, y2, Z2), (X2, Y2, z2), (X2, Y2, Z2)]
    ):
        r = jnp.sqrt(ax + ay + az)
        b = g[:, k] * scale + r
        ub = b if ub is None else jnp.minimum(ub, b)
    return ub.reshape(pts01.shape[:-1])


def pts_sample_blend_weights_packed(pts, packed, bounds,
                                    n_channels: int = 25):
    """`pts_sample_blend_weights` over a corner-packed volume."""
    mn, mx = bounds[0], bounds[1]
    pts01 = (pts - mn) / (mx - mn)
    return grid_trilerp_packed(packed, pts01, n_channels)


def grid_bilerp(img: jnp.ndarray, uv01: jnp.ndarray) -> jnp.ndarray:
    """Sample `img` (H, W, C) at normalized points (..., 2) in [0, 1].

    2-D analogue of grid_trilerp with the same align_corners=True /
    border-clamp semantics (used by the NT texture pyramid, which the
    reference samples with F.grid_sample — lib/networks/nt/texture.py).
    uv01[..., 0] indexes the W axis (u), [..., 1] the H axis (v).
    """
    H, W, C = img.shape
    u = jnp.clip(uv01[..., 0], 0.0, 1.0) * (W - 1)
    v = jnp.clip(uv01[..., 1], 0.0, 1.0) * (H - 1)
    u0 = jnp.floor(u)
    v0 = jnp.floor(v)
    fu = (u - u0)[..., None]
    fv = (v - v0)[..., None]
    u0 = u0.astype(jnp.int32)
    v0 = v0.astype(jnp.int32)
    u1 = jnp.minimum(u0 + 1, W - 1)
    v1 = jnp.minimum(v0 + 1, H - 1)

    flat = img.reshape(-1, C)

    def take(vi, ui):
        return jnp.take(flat, vi * W + ui, axis=0)

    c00 = take(v0, u0)
    c01 = take(v0, u1)
    c10 = take(v1, u0)
    c11 = take(v1, u1)
    c0 = c00 * (1 - fu) + c01 * fu
    c1 = c10 * (1 - fu) + c11 * fu
    return c0 * (1 - fv) + c1 * fv


def pts_sample_blend_weights(pts, vol, bounds):
    """Interpolate per-point blend weights from a voxel volume.

    Args:
      pts: (..., 3) points in SMPL coordinates.
      vol: (D, H, W, C) blend-weight volume (C = 24 weights + 1 distance
        channel in the reference's `lbs/bweights/<i>.npy` files, which are
        stored exactly in this layout — tpose_dataset.py:158).
      bounds: (2, 3) volume bounds in SMPL coordinates.

    Returns:
      (..., C) interpolated channels. Reference: blend_utils.py:119-149.
    """
    mn, mx = bounds[0], bounds[1]
    pts01 = (pts - mn) / (mx - mn)
    return grid_trilerp(vol, pts01)
