"""Differentiable point-cloud splatting: TPU-native replacement for the
external PCPR CUDA rasterizer used by the NHR baseline
(lib/networks/nhr/pcpr_layer.py:4,17-110, SURVEY.md §2.8).

PCPR rasterizes a point cloud into a per-pixel nearest-point index map +
depth map; NHR then gathers per-point features into an image. Here:

  1. project points through K, R, T (base_utils.py:86-95 convention),
  2. z-buffer by scatter-min of depth per pixel,
  3. resolve ties/winners by scatter-min of point index among points
     whose depth matches the z-buffer within `z_eps`,
  4. gather features by the winning index (differentiable w.r.t.
     features — the same gradient surface PCPR exposes).

Static shapes throughout; invalid/offscreen points are routed to a
sentinel pixel that is dropped afterwards. The integer `splat_radius`
replicates each point over a (2r+1)^2 pixel footprint (PCPR's per-point
radius); radius 0 writes a single pixel.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(1.0e38)


@functools.partial(
    jax.jit, static_argnames=("H", "W", "splat_radius", "z_eps")
)
def rasterize_points(pts, features, K, R, T, H: int, W: int,
                     splat_radius: int = 1, z_eps: float = 1e-4):
    """Splat a point cloud into an image.

    Args:
      pts: (P, 3) world-space points.
      features: (P, C) per-point features.
      K: (3, 3) intrinsics; R: (3, 3); T: (3, 1) world->camera.
    Returns dict:
      feature_map (H, W, C), depth (H, W) (0 where empty),
      index (H, W) int32 (-1 where empty), mask (H, W) bool.
    """
    P = pts.shape[0]
    cam = pts @ R.T + T.reshape(1, 3)
    uvw = cam @ K.T
    depth = uvw[:, 2]
    u = uvw[:, 0] / jnp.maximum(depth, 1e-8)
    v = uvw[:, 1] / jnp.maximum(depth, 1e-8)
    ui = jnp.round(u).astype(jnp.int32)
    vi = jnp.round(v).astype(jnp.int32)

    npix = H * W
    offsets = [
        (dy, dx)
        for dy in range(-splat_radius, splat_radius + 1)
        for dx in range(-splat_radius, splat_radius + 1)
    ]

    zbuf = jnp.full((npix + 1,), _INF, jnp.float32)
    flats = []
    for dy, dx in offsets:
        uu, vv = ui + dx, vi + dy
        valid = (depth > 1e-8) & (uu >= 0) & (uu < W) & (vv >= 0) & (vv < H)
        flat = jnp.where(valid, vv * W + uu, npix)
        flats.append(flat)
        zbuf = zbuf.at[flat].min(depth)

    pid = jax.lax.broadcasted_iota(jnp.int32, (P, 1), 0)[:, 0]
    winner_idx = jnp.full((npix + 1,), P, jnp.int32)
    for flat in flats:
        is_front = depth <= zbuf[flat] + z_eps
        winner_idx = winner_idx.at[
            jnp.where(is_front, flat, npix)
        ].min(pid)

    winner_idx = winner_idx[:npix]
    zbuf = zbuf[:npix]
    mask = winner_idx < P
    safe_idx = jnp.where(mask, winner_idx, 0)
    fmap = jnp.where(mask[:, None], features[safe_idx], 0.0)
    return {
        "feature_map": fmap.reshape(H, W, -1),
        "depth": jnp.where(mask, zbuf, 0.0).reshape(H, W),
        "index": jnp.where(mask, winner_idx, -1).reshape(H, W),
        "mask": mask.reshape(H, W),
    }
