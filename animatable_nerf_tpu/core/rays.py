"""Ray generation and ray/AABB intersection.

Host-side (numpy/cv2) versions feed the data pipeline exactly like the
reference's CPU workers; `get_near_far_masked` is the jittable
static-shape variant used inside TPU programs.

Reference semantics: lib/utils/if_nerf/if_nerf_data_utils.py:64-89
(`get_rays`), :156-196 (`get_near_far` — slab test keeping rays with
exactly two in-box plane intersections, bounds inflated by +/-0.01),
:92-135 (`get_bound_2d_mask`).
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

try:  # cv2 is available in the image; keep a guard for minimal installs
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def get_rays_np(H: int, W: int, K: np.ndarray, R: np.ndarray, T: np.ndarray):
    """Per-pixel world-space rays for a pinhole camera (w2c extrinsics).

    Returns (rays_o, rays_d), both (H, W, 3); directions are normalized.
    Reference: if_nerf_data_utils.py:64-89.
    """
    rays_o = -np.dot(R.T, T).ravel()
    i, j = np.meshgrid(
        np.arange(W, dtype=np.float32), np.arange(H, dtype=np.float32), indexing="xy"
    )
    xy1 = np.stack([i, j, np.ones_like(i)], axis=2)
    pixel_camera = np.dot(xy1, np.linalg.inv(K).T)
    pixel_world = np.dot(pixel_camera - T.ravel(), R)
    rays_d = pixel_world - rays_o[None, None]
    rays_d = rays_d / np.linalg.norm(rays_d, axis=2, keepdims=True)
    rays_o = np.broadcast_to(rays_o, rays_d.shape)
    return rays_o.astype(np.float32), rays_d.astype(np.float32)


def _slab_intersections(bounds, ray_o, ray_d, xp):
    """Shared slab math. Returns (d_abs (n,6), valid (n,6) bool)."""
    bounds = bounds + xp.asarray([-0.01, 0.01], dtype=bounds.dtype)[:, None]
    nom = bounds[None] - ray_o[:, None]  # (n, 2, 3)
    # axis-parallel rays divide by zero here; the resulting inf/nan plane
    # hits fail the box-membership test below, exactly as in the reference
    if xp is np:
        with np.errstate(divide="ignore", invalid="ignore"):
            d_int = (nom / ray_d[:, None]).reshape(-1, 6)  # (n, 6)
            p_int = d_int[..., None] * ray_d[:, None] + ray_o[:, None]
    else:
        d_int = (nom / ray_d[:, None]).reshape(-1, 6)  # (n, 6)
        p_int = d_int[..., None] * ray_d[:, None] + ray_o[:, None]  # (n, 6, 3)
    eps = 1e-6
    lo = bounds[0] - eps
    hi = bounds[1] + eps
    valid = xp.all((p_int >= lo) & (p_int <= hi), axis=-1)  # (n, 6)
    # the reference measures ||p - o|| / ||ray_d||; since p - o = d_int * ray_d
    # this is exactly |d_int| (reference keeps box-behind-camera rays with
    # positive distances — quirk preserved)
    d_abs = xp.abs(d_int)
    return d_abs, valid


def get_near_far_np(bounds: np.ndarray, ray_o: np.ndarray, ray_d: np.ndarray):
    """Compacting host version: returns (near (n',), far (n',), mask (n,)).

    A ray is kept iff exactly 2 of its 6 slab-plane intersections lie on
    the (inflated) box — reference if_nerf_data_utils.py:156-196.
    """
    d_abs, valid = _slab_intersections(
        bounds.astype(np.float64), ray_o.astype(np.float64), ray_d.astype(np.float64), np
    )
    mask_at_box = valid.sum(-1) == 2
    sel = d_abs[mask_at_box]
    vsel = valid[mask_at_box]
    big = np.where(vsel, sel, np.inf)
    near = big.min(-1)
    small = np.where(vsel, sel, -np.inf)
    far = small.max(-1)
    return near.astype(np.float32), far.astype(np.float32), mask_at_box


def get_near_far_masked(bounds, ray_o, ray_d):
    """Jittable static-shape version: per-ray (near, far, mask).

    near/far are only meaningful where mask is True (they are set to
    (0, 1) elsewhere so downstream sampling stays finite).
    """
    d_abs, valid = _slab_intersections(bounds, ray_o, ray_d, jnp)
    mask = jnp.sum(valid, axis=-1) == 2
    near = jnp.min(jnp.where(valid, d_abs, jnp.inf), axis=-1)
    far = jnp.max(jnp.where(valid, d_abs, -jnp.inf), axis=-1)
    near = jnp.where(mask, near, 0.0)
    far = jnp.where(mask, far, 1.0)
    return near, far, mask


_BOX_FACES = [
    [0, 1, 3, 2, 0],
    [4, 5, 7, 6, 5],
    [0, 1, 5, 4, 0],
    [2, 3, 7, 6, 2],
    [0, 2, 6, 4, 0],
    [1, 3, 7, 5, 1],
]


def get_bound_corners(bounds: np.ndarray) -> np.ndarray:
    """8 corners of an AABB, in the reference's ordering
    (if_nerf_data_utils.py:92-111)."""
    mn, mx = bounds[0], bounds[1]
    return np.array(
        [
            [mn[0], mn[1], mn[2]],
            [mn[0], mn[1], mx[2]],
            [mn[0], mx[1], mn[2]],
            [mn[0], mx[1], mx[2]],
            [mx[0], mn[1], mn[2]],
            [mx[0], mn[1], mx[2]],
            [mx[0], mx[1], mn[2]],
            [mx[0], mx[1], mx[2]],
        ]
    )


def project_np(xyz: np.ndarray, K: np.ndarray, RT: np.ndarray) -> np.ndarray:
    """Project world points to pixel coords. Reference: base_utils.py:86-95."""
    xyz = np.dot(xyz, RT[:, :3].T) + RT[:, 3:].T
    xyz = np.dot(xyz, K.T)
    return xyz[:, :2] / xyz[:, 2:]


def get_bound_2d_mask(bounds, K, pose, H, W) -> np.ndarray:
    """Rasterize the projected 3D bbox into a binary (H, W) mask.

    Reference: if_nerf_data_utils.py:114-135 (cv2.fillPoly over the six
    box faces).
    """
    corners_3d = get_bound_corners(bounds)
    xyz = np.dot(corners_3d, pose[:, :3].T) + pose[:, 3:].T
    xy = np.dot(xyz, K.T)
    corners_2d = xy[:, :2] / xy[:, 2:]
    corners_2d = np.round(corners_2d).astype(int)
    mask = np.zeros((H, W), dtype=np.uint8)
    if cv2 is not None:
        for face in _BOX_FACES:
            cv2.fillPoly(mask, [corners_2d[face]], 1)
    else:  # pragma: no cover — conservative fallback: bounding rectangle
        x0, y0 = corners_2d.min(0)
        x1, y1 = corners_2d.max(0)
        mask[max(y0, 0) : y1 + 1, max(x0, 0) : x1 + 1] = 1
    return mask
