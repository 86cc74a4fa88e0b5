"""Host-side data utilities: mask processing, ray sampling, volume padding.

Ray sampling reproduces the reference's distribution exactly
(if_nerf_data_utils.py:199-307): at train time a loop draws
body_sample_ratio of the remaining budget from the body mask and the
rest from the projected-bbox mask, keeping only rays that intersect the
3D bounds, until N_rand rays are collected; at test time every ray whose
pixel lies in the projected bbox and whose slab test passes is kept.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

from ..core.rays import get_rays_np, get_near_far_np, get_bound_2d_mask


def erode_mask_edge(msk: np.ndarray, border: int = 5) -> np.ndarray:
    """Mark the mask boundary band with 100 (ignored at sampling time).
    Reference: tpose_dataset.py:116-121."""
    kernel = np.ones((border, border), np.uint8)
    msk = msk.copy()
    er = cv2.erode(msk.copy(), kernel)
    di = cv2.dilate(msk.copy(), kernel)
    msk[(di - er) == 1] = 100
    return msk


def crop_mask_edge(msk: np.ndarray, border: int = 10) -> np.ndarray:
    """Reference: if_nerf_data_utils.py:598-605."""
    return erode_mask_edge(msk, border)


def get_bounds(xyz: np.ndarray, box_padding: float = 0.05) -> np.ndarray:
    """AABB of a vertex set, padded (if_nerf_data_utils.py:566-579)."""
    mn = xyz.min(0) - box_padding
    mx = xyz.max(0) + box_padding
    return np.stack([mn, mx]).astype(np.float32)


def sample_rays_image(
    img,
    msk,
    K,
    R,
    T,
    bounds,
    nrays: int,
    split: str,
    body_sample_ratio: float = 0.5,
    face_sample_ratio: float = 0.0,
    mask_bkgd: bool = True,
    rng: np.random.RandomState | None = None,
):
    """Sample rays for one image. Returns
    (rgb, ray_o, ray_d, near, far, coord, mask_at_box).

    Train: exactly `nrays` rays via the body/bbox loop; test: all rays in
    the projected bbox that hit the 3D bounds.
    """
    rng = rng or np.random
    H, W = img.shape[:2]
    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    pose = np.concatenate([R, T.reshape(3, 1)], axis=1)
    bound_mask = get_bound_2d_mask(bounds, K, pose, H, W)

    if mask_bkgd:
        img[bound_mask != 1] = 0
    msk = msk * bound_mask
    bound_mask[msk == 100] = 0

    if split == "train":
        n_sampled = 0
        outs = ([], [], [], [], [], [], [])
        coord_body_all = np.argwhere(msk == 1)
        coord_bound_all = np.argwhere(bound_mask == 1)
        while n_sampled < nrays:
            n_body = int((nrays - n_sampled) * body_sample_ratio)
            n_face = int((nrays - n_sampled) * face_sample_ratio)
            n_rand = (nrays - n_sampled) - n_body - n_face
            coord_body = coord_body_all[
                rng.randint(0, len(coord_body_all), n_body)
            ]
            coords = [coord_body]
            coord_face_all = np.argwhere(msk == 13)
            if len(coord_face_all) > 0 and n_face > 0:
                coords.append(
                    coord_face_all[rng.randint(0, len(coord_face_all), n_face)]
                )
            coords.append(coord_bound_all[rng.randint(0, len(coord_bound_all), n_rand)])
            coord = np.concatenate(coords, axis=0)

            ro = ray_o[coord[:, 0], coord[:, 1]]
            rd = ray_d[coord[:, 0], coord[:, 1]]
            rgb = img[coord[:, 0], coord[:, 1]]
            near, far, mab = get_near_far_np(bounds, ro, rd)
            outs[0].append(rgb[mab])
            outs[1].append(ro[mab])
            outs[2].append(rd[mab])
            outs[3].append(near)
            outs[4].append(far)
            outs[5].append(coord[mab])
            outs[6].append(mab[mab])
            n_sampled += len(near)
        rgb, ro, rd, near, far, coord, mab = [
            np.concatenate(o) for o in outs
        ]
        # the loop can overshoot by the last chunk's in-box count in the
        # reference too — it never trims; we keep parity by not trimming
        return (
            rgb.astype(np.float32),
            ro.astype(np.float32),
            rd.astype(np.float32),
            near.astype(np.float32),
            far.astype(np.float32),
            coord,
            mab,
        )

    rgb = img.reshape(-1, 3).astype(np.float32)
    ro = ray_o.reshape(-1, 3)
    rd = ray_d.reshape(-1, 3)
    near, far, mab = get_near_far_np(bounds, ro, rd)
    coord = np.argwhere(mab.reshape(H, W))
    return (
        rgb[mab],
        ro[mab].astype(np.float32),
        rd[mab].astype(np.float32),
        near.astype(np.float32),
        far.astype(np.float32),
        coord,
        mab,
    )


def pad_volume_to(vol: np.ndarray, bounds: np.ndarray, target_shape):
    """Edge-pad a (D,H,W,C) volume to `target_shape` and extend `bounds`
    so trilinear sampling is EXACTLY unchanged.

    With align_corners mapping [min, max] -> [0, size-1], appending k
    edge-replicated voxels on the high side while moving max out by
    k * voxel (voxel = (max-min)/(size-1)) keeps every original grid
    point at the same physical position, and border-clamped samples past
    the old max read the same replicated edge values. This is what lets
    per-frame variable-shape volumes feed a fixed-shape jitted program.
    """
    D, H, W, C = vol.shape
    tD, tH, tW = target_shape
    assert tD >= D and tH >= H and tW >= W
    mn, mx = bounds[0].copy(), bounds[1].copy()
    voxel = (mx - mn) / (np.array([D, H, W]) - 1.0)
    pads = (tD - D, tH - H, tW - W)
    if any(pads):
        # manual edge-replicate: np.pad's generic path is ~10x slower on
        # these 4-D volumes (the dataloader hot spot)
        out = np.empty((tD, tH, tW, C), dtype=vol.dtype)
        out[:D, :H, :W] = vol
        if tW > W:
            out[:D, :H, W:] = out[:D, :H, W - 1 : W]
        if tH > H:
            out[:D, H:, :] = out[:D, H - 1 : H, :]
        if tD > D:
            out[D:] = out[D - 1 : D]
        vol = out
    mx = mx + voxel * np.array(pads)
    return vol, np.stack([mn, mx]).astype(np.float32)
