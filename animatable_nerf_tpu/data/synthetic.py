"""Synthetic dataset generator emitting the EXACT on-disk layout the
reference datasets consume (annots.npy + params/ + vertices/ + lbs/ +
images + masks — tpose_dataset.py:15-161, tpose_pdf_dataset.py:60-90),
so the loaders, trainers and evaluators can be exercised end-to-end
without the licensed ZJU-MoCap / Human3.6M data.

The scene is an articulated blob-person: a 24-joint SMPL-topology
skeleton, vertices skinned with exact LBS, and a world-space density
field of Gaussian blobs anchored at skinned vertices with canonical
colors — multi-view-consistent by construction, so PSNR/convergence
tests are meaningful.
"""

from __future__ import annotations

import os

import numpy as np

from ..core.rays import get_rays_np, get_near_far_np
from ..core.skeleton import rigid_transforms, big_poses_vec
from .utils import get_bounds

SMPL_PARENTS = np.array(
    [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
     19, 20, 21]
)

# rough humanoid rest pose (SMPL joint ordering), ~1.7m tall, pelvis origin
REST_JOINTS = np.array(
    [
        [0.00, 0.00, 0.00],   # 0 pelvis
        [0.09, -0.08, 0.00],  # 1 L hip
        [-0.09, -0.08, 0.00], # 2 R hip
        [0.00, 0.12, 0.00],   # 3 spine1
        [0.10, -0.45, 0.00],  # 4 L knee
        [-0.10, -0.45, 0.00], # 5 R knee
        [0.00, 0.25, 0.00],   # 6 spine2
        [0.10, -0.85, 0.00],  # 7 L ankle
        [-0.10, -0.85, 0.00], # 8 R ankle
        [0.00, 0.32, 0.00],   # 9 spine3
        [0.12, -0.92, 0.10],  # 10 L foot
        [-0.12, -0.92, 0.10], # 11 R foot
        [0.00, 0.45, 0.00],   # 12 neck
        [0.07, 0.40, 0.00],   # 13 L collar
        [-0.07, 0.40, 0.00],  # 14 R collar
        [0.00, 0.58, 0.02],   # 15 head
        [0.18, 0.42, 0.00],   # 16 L shoulder
        [-0.18, 0.42, 0.00],  # 17 R shoulder
        [0.42, 0.40, 0.00],   # 18 L elbow
        [-0.42, 0.40, 0.00],  # 19 R elbow
        [0.65, 0.40, 0.00],   # 20 L wrist
        [-0.65, 0.40, 0.00],  # 21 R wrist
        [0.72, 0.40, 0.00],   # 22 L hand
        [-0.72, 0.40, 0.00],  # 23 R hand
    ],
    dtype=np.float32,
)


def _make_vertices(joints, parents, n_verts, rng):
    """Vertices on limb segments with smooth joint-distance weights."""
    segs = [(parents[i], i) for i in range(1, 24)]
    per_seg = n_verts // len(segs)
    pts = []
    for a, b in segs:
        t = rng.rand(per_seg, 1).astype(np.float32)
        axis = joints[b] - joints[a]
        base = joints[a] + t * axis
        noise = rng.randn(per_seg, 3).astype(np.float32) * 0.035
        pts.append(base + noise)
    rest = n_verts - per_seg * len(segs)
    if rest:
        pts.append(
            joints[0] + rng.randn(rest, 3).astype(np.float32) * 0.08
        )
    verts = np.concatenate(pts, axis=0).astype(np.float32)
    d2 = ((verts[:, None, :] - joints[None]) ** 2).sum(-1)
    w = np.exp(-d2 / (2 * 0.05**2))
    w = w / w.sum(-1, keepdims=True)
    return verts, w.astype(np.float32)


def _lbs_forward(tverts, weights, A):
    """Exact forward LBS in numpy: x' = sum_k w_k (R_k x + t_k)."""
    M = weights @ A.reshape(24, 16)
    M = M.reshape(-1, 4, 4)
    out = np.einsum("nij,nj->ni", M[:, :3, :3], tverts) + M[:, :3, 3]
    return out.astype(np.float32)


def _look_at(eye, center, up=(0, 1, 0)):
    """World->camera R (3,3), T (3,) with +z forward."""
    eye = np.asarray(eye, np.float64)
    center = np.asarray(center, np.float64)
    f = center - eye
    f = f / np.linalg.norm(f)
    u = np.asarray(up, np.float64)
    s = np.cross(f, u)
    s = s / np.linalg.norm(s)
    u2 = np.cross(s, f)
    R = np.stack([s, -u2, f], axis=0)  # rows: right, down, forward
    T = -R @ eye
    return R.astype(np.float32), T.astype(np.float32)


def _blob_render_jax(pts, z, centers, colors, sigma, amp):
    """Jitted blob-field integration: pts (n, S, 3), z (n, S)."""
    import jax
    import jax.numpy as jnp

    flat = pts.reshape(-1, 3)
    d2 = (
        jnp.sum(flat * flat, -1, keepdims=True)
        - 2 * flat @ centers.T
        + jnp.sum(centers * centers, -1)
    )
    w = jnp.exp(-d2 / (2 * sigma**2))  # (N, B)
    dens = jnp.sum(w, -1)
    col = (w @ colors) / jnp.maximum(dens[:, None], 1e-8)
    S = z.shape[-1]
    dens = (amp * dens).reshape(-1, S)
    col = col.reshape(-1, S, 3)
    dists = jnp.diff(z, axis=-1)
    dists = jnp.concatenate([dists, dists[:, -1:]], -1)
    alpha = 1 - jnp.exp(-dens * dists)
    trans = jnp.cumprod(
        jnp.concatenate([jnp.ones_like(alpha[:, :1]), 1 - alpha + 1e-10], -1), -1
    )[:, :-1]
    wgt = alpha * trans
    return jnp.sum(wgt[..., None] * col, 1), jnp.sum(wgt, 1)


def _render_blob_image(H, W, K, R, T, centers, colors, wbounds, sigma=0.045,
                       amp=240.0, n_samples=96):
    """Analytic volume rendering of the Gaussian blob field (jitted)."""
    import jax
    import jax.numpy as jnp

    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    ro = ray_o.reshape(-1, 3)
    rd = ray_d.reshape(-1, 3)
    near, far, mask = get_near_far_np(wbounds, ro, rd)
    img = np.zeros((H * W, 3), np.float32)
    acc_full = np.zeros((H * W,), np.float32)
    if mask.sum() == 0:
        return img.reshape(H, W, 3), acc_full.reshape(H, W)

    ro, rd = ro[mask], rd[mask]
    t = np.linspace(0, 1, n_samples, dtype=np.float32)
    z = near[:, None] * (1 - t) + far[:, None] * t  # (n, S)
    pts = ro[:, None] + rd[:, None] * z[..., None]  # (n, S, 3)
    # pad the ray count to a bucket so the jit program is reused
    n = len(z)
    target = 1 << (n - 1).bit_length()
    padz = np.pad(z, [(0, target - n), (0, 0)], mode="edge")
    padp = np.pad(pts, [(0, target - n), (0, 0), (0, 0)], mode="edge")
    rgb, acc = jax.jit(_blob_render_jax, static_argnums=(4, 5))(
        jnp.asarray(padp), jnp.asarray(padz), jnp.asarray(centers),
        jnp.asarray(colors), float(sigma), float(amp),
    )
    img[mask] = np.asarray(rgb)[:n]
    acc_full[mask] = np.asarray(acc)[:n]
    return img.reshape(H, W, 3), acc_full.reshape(H, W)


# ---------------------------------------------------------------------------
# Watertight capsule-union subject (subject="capsule").
#
# The blob subject's soft Gaussian tails are provably unrepresentable by a
# watertight-surface prior (BASELINE.md, round-2 long-schedule analysis), so
# the SDF families (anisdf_pdf_network.py:156-224) need a subject whose true
# geometry IS a surface: a union of capsules along the 23 skeleton bones.
# Properties, all exact by construction:
#   - the posed body SDF is analytic and 1-Lipschitz:
#     sdf(x) = min_k (dist(x, posed segment k) - r_k);
#   - surface vertices carry ONE-HOT skinning weights on the segment's
#     parent joint, so LBS-posed vertices lie exactly on the posed capsule
#     union (a capsule is rotation-invariant about its axis and a one-hot
#     LBS transform is the bone's rigid transform);
#   - images are sphere-traced from the exact SDF with fixed world lights
#     and a canonical-space albedo (multi-view/multi-frame consistent);
#   - masks are hard silhouettes (ray hits the surface);
#   - GT meshes (write_gt_meshes) are marching cubes at level 0 of the
#     same analytic SDF — a perfectly trained SDF extracted at 0 matches.
# Radii stay <= 0.08 so every interior point is within the hard-coded 0.1
# KNN shell (models/pdf.py NORM_TH, anisdf_pdf_network.py:172) of a
# surface vertex.

CAPSULE_SEGMENTS = [(int(SMPL_PARENTS[c]), c) for c in range(1, 24)]

# indexed by child joint - 1 (segment parent->child)
CAPSULE_RADII = np.array(
    [
        0.070, 0.070, 0.080,  # hips L/R, spine1
        0.055, 0.055, 0.080,  # knees L/R (thighs), spine2
        0.045, 0.045, 0.080,  # ankles L/R (shins), spine3
        0.035, 0.035, 0.045,  # feet L/R, neck
        0.060, 0.060, 0.075,  # collars L/R, head
        0.050, 0.050,         # shoulders L/R
        0.042, 0.042,         # elbows L/R (upper arms)
        0.035, 0.035,         # wrists L/R (forearms)
        0.030, 0.030,         # hands L/R
    ],
    dtype=np.float32,
)


def capsule_union_sdf_np(pts, seg_a, seg_b, radii, chunk=262144):
    """Exact SDF of the capsule union: min_k (dist(x, seg_k) - r_k).

    seg_a/seg_b: (K, 3) segment endpoints; radii: (K,). 1-Lipschitz.
    """
    pts = np.asarray(pts, np.float32).reshape(-1, 3)
    seg_a = np.asarray(seg_a, np.float32)
    ba = np.asarray(seg_b, np.float32) - seg_a
    bb = np.maximum((ba * ba).sum(-1), 1e-12)
    out = np.empty(len(pts), np.float32)
    for i in range(0, len(pts), chunk):
        p = pts[i : i + chunk]
        pa = p[:, None, :] - seg_a[None]
        h = np.clip((pa * ba).sum(-1) / bb, 0.0, 1.0)
        d = np.linalg.norm(pa - h[..., None] * ba[None], axis=-1) - radii
        out[i : i + chunk] = d.min(-1)
    return out


def _capsule_surface_verts(joints, parents, n_verts, rng):
    """Sample vertices ON the capsule-union surface with one-hot weights
    on each segment's parent joint (exact rigid skinning)."""
    segs = CAPSULE_SEGMENTS
    radii = CAPSULE_RADII
    lens = np.array(
        [np.linalg.norm(joints[b] - joints[a]) for a, b in segs], np.float32
    )
    # allocate counts proportional to capsule surface area
    area = 2 * np.pi * radii * lens + 4 * np.pi * radii**2
    counts = np.maximum((n_verts * area / area.sum()).astype(int), 4)
    while counts.sum() > n_verts:
        counts[counts.argmax()] -= 1
    counts[area.argmax()] += n_verts - counts.sum()

    pts, wrows = [], []
    for k, (a, b) in enumerate(segs):
        n = counts[k]
        r = radii[k]
        ja, jb = joints[a], joints[b]
        axis = jb - ja
        L = max(np.linalg.norm(axis), 1e-8)
        az = axis / L
        ref = np.array([0.0, 0.0, 1.0]) if abs(az[2]) < 0.9 else np.array([1.0, 0.0, 0.0])
        u = np.cross(az, ref)
        u /= np.linalg.norm(u)
        v = np.cross(az, u)
        # split cylinder side vs spherical caps by area
        side_frac = (2 * np.pi * r * L) / (2 * np.pi * r * L + 4 * np.pi * r**2)
        n_side = int(round(n * side_frac))
        th = rng.rand(n_side) * 2 * np.pi
        t = rng.rand(n_side)
        side = (
            ja[None]
            + t[:, None] * axis[None]
            + r * (np.cos(th)[:, None] * u[None] + np.sin(th)[:, None] * v[None])
        )
        n_cap = n - n_side
        dirs = rng.randn(n_cap, 3)
        dirs /= np.maximum(np.linalg.norm(dirs, axis=-1, keepdims=True), 1e-9)
        # flip each direction into the outward hemisphere of its end
        end_sel = rng.rand(n_cap) < 0.5
        sign = np.where((dirs @ az > 0) == end_sel, 1.0, -1.0)
        dirs = dirs * sign[:, None]
        caps = np.where(end_sel[:, None], jb[None], ja[None]) + r * dirs
        pts.append(np.concatenate([side, caps], 0).astype(np.float32))
        w = np.zeros((n, 24), np.float32)
        w[:, a] = 1.0
        wrows.append(w)
    return np.concatenate(pts, 0), np.concatenate(wrows, 0)


def _capsule_shade_jax(pts, rd, seg_a, seg_b, radii, Minv):
    """Shared shading: normal from the argmin capsule, albedo from the
    rest-canonical position of the hit point, two fixed world lights."""
    import jax.numpy as jnp

    ba = seg_b - seg_a
    bb = jnp.maximum(jnp.sum(ba * ba, -1), 1e-12)
    pa = pts[:, None, :] - seg_a[None]
    h = jnp.clip(jnp.sum(pa * ba, -1) / bb, 0.0, 1.0)
    d = jnp.linalg.norm(pa - h[..., None] * ba[None], axis=-1) - radii
    k = jnp.argmin(d, -1)
    hk = jnp.take_along_axis(h, k[:, None], 1)[:, 0]
    cp = seg_a[k] + hk[:, None] * ba[k]
    n = pts - cp
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)
    xc = jnp.einsum("nij,nj->ni", Minv[k, :, :3], pts) + Minv[k, :, 3]
    albedo = 0.55 + 0.40 * jnp.sin(
        xc * jnp.array([7.0, 5.0, 9.0]) + jnp.array([0.0, 2.0, 4.0])
    )
    l1 = jnp.array([0.442, 0.786, 0.432])
    l2 = jnp.array([-0.577, -0.577, 0.577])
    shade = (
        0.35
        + 0.55 * jnp.maximum(jnp.sum(n * l1, -1), 0.0)
        + 0.25 * jnp.maximum(jnp.sum(n * l2, -1), 0.0)
    )
    return albedo * jnp.clip(shade, 0.0, 1.0)[:, None], jnp.min(d, -1)


def _capsule_trace_jax(ro, rd, near, far, seg_a, seg_b, radii, Minv):
    """Sphere-trace the exact capsule-union SDF (jitted)."""
    import jax
    import jax.numpy as jnp

    ba = seg_b - seg_a
    bb = jnp.maximum(jnp.sum(ba * ba, -1), 1e-12)

    def sdf(p):
        pa = p[:, None, :] - seg_a[None]
        h = jnp.clip(jnp.sum(pa * ba, -1) / bb, 0.0, 1.0)
        d = jnp.linalg.norm(pa - h[..., None] * ba[None], axis=-1) - radii
        return jnp.min(d, -1)

    def step(i, t):
        d = sdf(ro + t[:, None] * rd)
        return jnp.minimum(t + jnp.maximum(d, 0.0), far + 0.2)

    t = jax.lax.fori_loop(0, 96, step, near)
    x = ro + t[:, None] * rd
    rgb, d = _capsule_shade_jax(x, rd, seg_a, seg_b, radii, Minv)
    hit = d < 1e-3
    return jnp.where(hit[:, None], rgb, 0.0), hit


def _render_capsule_image(H, W, K, R, T, seg_a, seg_b, radii, Minv, wbounds):
    """Sphere-traced rendering of the capsule body (hard silhouette)."""
    import jax
    import jax.numpy as jnp

    ray_o, ray_d = get_rays_np(H, W, K, R, T)
    ro = ray_o.reshape(-1, 3)
    rd = ray_d.reshape(-1, 3)
    near, far, mask = get_near_far_np(wbounds, ro, rd)
    img = np.zeros((H * W, 3), np.float32)
    hit_full = np.zeros((H * W,), bool)
    if mask.sum() == 0:
        return img.reshape(H, W, 3), hit_full.reshape(H, W)
    ro, rd = ro[mask], rd[mask]
    n = len(ro)
    target = 1 << (n - 1).bit_length()
    pad = lambda a: np.pad(a, [(0, target - n)] + [(0, 0)] * (a.ndim - 1), mode="edge")
    rgb, hit = jax.jit(_capsule_trace_jax)(
        jnp.asarray(pad(ro)), jnp.asarray(pad(rd)),
        jnp.asarray(pad(near)), jnp.asarray(pad(far)),
        jnp.asarray(seg_a), jnp.asarray(seg_b),
        jnp.asarray(radii), jnp.asarray(Minv),
    )
    img[mask] = np.asarray(rgb)[:n]
    hit_full[mask] = np.asarray(hit)[:n]
    return img.reshape(H, W, 3), hit_full.reshape(H, W)


def _capsule_world_frames(A, Rw, Th, posed_joints, joints):
    """Per-segment world endpoints + inverse world-from-rest transforms.

    World transform of segment (p, c): x_w = Rw (A_p[:3,:3] x + A_p[:3,3]) + Th.
    Returns (seg_a, seg_b, radii, Minv (K,3,4)) with Minv mapping world ->
    rest canonical (for the frame-invariant albedo)."""
    wj = posed_joints @ Rw.T + Th
    seg_a = np.stack([wj[a] for a, _ in CAPSULE_SEGMENTS]).astype(np.float32)
    seg_b = np.stack([wj[b] for _, b in CAPSULE_SEGMENTS]).astype(np.float32)
    Minv = np.zeros((len(CAPSULE_SEGMENTS), 3, 4), np.float32)
    for k, (p, _c) in enumerate(CAPSULE_SEGMENTS):
        Rk = Rw @ A[p, :3, :3]
        tk = Rw @ A[p, :3, 3] + Th.reshape(3)
        Minv[k, :, :3] = Rk.T
        Minv[k, :, 3] = -Rk.T @ tk
    return seg_a, seg_b, CAPSULE_RADII, Minv


def _bw_volume(pverts, weights, box_padding=0.05, voxel=0.025):
    """Posed blend-weight volume in the reference's 25-channel layout
    (24 weights + distance-to-surface; prepare_blend_weights.py:156-213),
    nearest-vertex variant, grid aligned to get_bounds padding."""
    from scipy.spatial import cKDTree

    bounds = get_bounds(pverts, box_padding)
    shape = np.maximum(
        np.ceil((bounds[1] - bounds[0]) / voxel).astype(int) + 1, 2
    )
    axes = [np.linspace(bounds[0][i], bounds[1][i], shape[i]) for i in range(3)]
    grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    tree = cKDTree(pverts)
    dist, idx = tree.query(grid)
    vol = np.concatenate(
        [weights[idx], dist[:, None]], axis=-1
    ).reshape(*shape, 25)
    return vol.astype(np.float32), bounds


def generate_synthetic_dataset(
    root: str,
    n_frames: int = 4,
    n_views: int = 4,
    image_size: int = 128,
    n_verts: int = 1380,
    n_blobs: int = 256,
    seed: int = 0,
    subject: str = "blobs",
):
    """Write a complete reference-format dataset under `root`.

    subject: "blobs" (Gaussian density cloud — soft, density-family
    friendly) or "capsule" (watertight capsule-union body with hard
    silhouettes and an analytic SDF — what the SDF families need)."""
    import cv2

    if subject not in ("blobs", "capsule"):
        raise ValueError(f"unknown subject {subject!r}")
    rng = np.random.RandomState(seed)
    os.makedirs(root, exist_ok=True)
    joints = REST_JOINTS.copy()
    parents = SMPL_PARENTS
    if subject == "capsule":
        tverts, weights = _capsule_surface_verts(joints, parents, n_verts, rng)
    else:
        tverts, weights = _make_vertices(joints, parents, n_verts, rng)

    # lbs metadata (prepare_lbs_meta.py outputs)
    lbs = os.path.join(root, "lbs")
    os.makedirs(os.path.join(lbs, "bweights"), exist_ok=True)
    np.save(os.path.join(lbs, "joints.npy"), joints)
    np.save(os.path.join(lbs, "parents.npy"), parents)
    np.save(os.path.join(lbs, "weights.npy"), weights)
    np.save(os.path.join(lbs, "tvertices.npy"), tverts)
    # a simple triangle strip over the cloud (stand-in for SMPL faces)
    faces = np.stack(
        [
            np.arange(n_verts - 2),
            np.arange(1, n_verts - 1),
            np.arange(2, n_verts),
        ],
        axis=1,
    ).astype(np.int64)
    np.save(os.path.join(lbs, "faces.npy"), faces)

    # canonical big-pose template
    big_A = np.asarray(
        rigid_transforms(big_poses_vec().reshape(-1, 3), joints, parents)
    )
    bigpose_verts = _lbs_forward(tverts, weights, big_A)
    np.save(os.path.join(lbs, "bigpose_vertices.npy"), bigpose_verts)
    tbw, _tb = _bw_volume(tverts, weights)
    np.save(os.path.join(lbs, "tbw.npy"), tbw)
    bigpose_bw, _ = _bw_volume(bigpose_verts, weights)
    np.save(os.path.join(lbs, "bigpose_bw.npy"), bigpose_bw)

    # cameras on a circle
    H = W = image_size
    focal = image_size * 1.6
    Ks, Rs, Ts, Ds = [], [], [], []
    for v in range(n_views):
        ang = 2 * np.pi * v / n_views
        eye = np.array([2.6 * np.sin(ang), 0.1, 2.6 * np.cos(ang)])
        R, T = _look_at(eye, [0, 0, 0])
        Ks.append(
            np.array([[focal, 0, W / 2], [0, focal, H / 2], [0, 0, 1]], np.float64)
        )
        Rs.append(R.astype(np.float64))
        Ts.append((T.astype(np.float64) * 1000.0).reshape(3, 1))  # loader divides by 1000
        Ds.append(np.zeros((5, 1)))

    os.makedirs(os.path.join(root, "params"), exist_ok=True)
    os.makedirs(os.path.join(root, "new_params"), exist_ok=True)
    os.makedirs(os.path.join(root, "vertices"), exist_ok=True)
    os.makedirs(os.path.join(root, "new_vertices"), exist_ok=True)

    blob_idx = rng.choice(len(tverts), size=min(n_blobs, len(tverts)), replace=False)
    blob_colors = (0.5 + 0.5 * np.sin(tverts[blob_idx] * 9.0 + np.array([0, 2, 4]))).astype(
        np.float32
    )

    ims_entries = []
    training_joints = []
    for f in range(n_frames):
        # smooth wiggle pose
        poses = np.zeros((24, 3), np.float32)
        poses[1:] = 0.25 * np.sin(
            f * 0.7 + np.arange(1, 24)[:, None] + np.array([0.0, 1.3, 2.1])
        ) * rng.uniform(0.4, 1.0, (23, 1)).astype(np.float32)
        Rh = np.array([0.0, 0.15 * f, 0.0], np.float32)
        Th = np.array([[0.02 * f, 0.0, 0.0]], np.float32)

        A, posed_joints = rigid_transforms(poses, joints, parents, return_joints=True)
        A = np.asarray(A)
        pverts = _lbs_forward(tverts, weights, A)
        Rw = cv2.Rodrigues(Rh)[0].astype(np.float32)
        wverts = pverts @ Rw.T + Th
        # world-space, like tools/prepare_lbs_meta.py's training_joints
        training_joints.append(np.asarray(posed_joints) @ Rw.T + Th)

        np.save(os.path.join(root, "vertices", f"{f}.npy"), wverts)
        np.save(os.path.join(root, "new_vertices", f"{f}.npy"), wverts)
        prm = {"Rh": Rh.reshape(1, 3), "Th": Th, "poses": poses.reshape(1, -1)}
        np.save(os.path.join(root, "params", f"{f}.npy"), prm)
        np.save(os.path.join(root, "new_params", f"{f}.npy"), prm)

        pbw, _pb = _bw_volume(pverts, weights)
        np.save(os.path.join(lbs, "bweights", f"{f}.npy"), pbw)

        wbounds = get_bounds(wverts)
        centers = wverts[blob_idx]
        if subject == "capsule":
            cap_frame = _capsule_world_frames(
                A, Rw, Th.reshape(3), np.asarray(posed_joints), joints
            )
        frame_ims = []
        for v in range(n_views):
            if subject == "capsule":
                img, hit = _render_capsule_image(
                    H, W, Ks[v], Rs[v].astype(np.float32),
                    (Ts[v][:, 0] / 1000.0).astype(np.float32),
                    *cap_frame, wbounds,
                )
                acc = hit.astype(np.float32)
            else:
                img, acc = _render_blob_image(
                    H, W, Ks[v], Rs[v].astype(np.float32),
                    (Ts[v][:, 0] / 1000.0).astype(np.float32),
                    centers, blob_colors, wbounds,
                )
            msk = (acc > 0.3).astype(np.uint8)
            img = img * msk[..., None]
            rel = os.path.join(f"Camera_B{v}", f"{f:04d}.jpg")
            os.makedirs(os.path.join(root, f"Camera_B{v}"), exist_ok=True)
            cv2.imwrite(
                os.path.join(root, rel),
                (np.clip(img[..., ::-1], 0, 1) * 255).astype(np.uint8),
            )
            mdir = os.path.join(root, "mask_cihp", f"Camera_B{v}")
            os.makedirs(mdir, exist_ok=True)
            cv2.imwrite(os.path.join(mdir, f"{f:04d}.png"), msk * 255)

            # UV render for the NT baseline (stand-in for the reference's
            # pytorch3d UV prerender, tools/render_h36m_uvmaps_pytorch3d.py):
            # splat per-vertex canonical uv into the view
            from ..ops.rasterize import rasterize_points

            mn, mx = tverts.min(0), tverts.max(0)
            vert_uv = (tverts[:, :2] - mn[:2]) / (mx[:2] - mn[:2] + 1e-8)
            args = (
                wverts.astype(np.float32), vert_uv.astype(np.float32),
                Ks[v].astype(np.float32), Rs[v].astype(np.float32),
                (Ts[v] / 1000.0).astype(np.float32),
            )
            try:
                ras = rasterize_points(*args, H, W, splat_radius=3)
            except ValueError as e:  # pragma: no cover - XLA:CPU quirk
                # An XLA:CPU executable-cache collision ("supplied N
                # buffers but compiled program expected N+1") can poison
                # this compile when certain jitted model programs ran
                # earlier in the process (order-dependent, CPU tests
                # only). A cache flush + retry compiles clean.
                if "buffers" not in str(e):
                    raise
                import jax

                jax.clear_caches()
                ras = rasterize_points(*args, H, W, splat_radius=3)
            uv_map = np.asarray(ras["feature_map"], np.float32)
            os.makedirs(os.path.join(root, "uv"), exist_ok=True)
            np.save(os.path.join(root, "uv", f"{f}_{v}.npy"), uv_map)
            frame_ims.append(rel)
        ims_entries.append({"ims": frame_ims})

    np.save(os.path.join(lbs, "training_joints.npy"), np.stack(training_joints))

    annots = {
        "cams": {"K": Ks, "D": Ds, "R": Rs, "T": Ts},
        "ims": ims_entries,
    }
    np.save(os.path.join(root, "annots.npy"), annots)
    return root


def blob_density_np(pts, centers, sigma=0.045, amp=240.0, chunk=262144):
    """Analytic blob density amp * sum_b exp(-|x-c_b|^2 / 2 sigma^2) —
    the exact field `_render_blob_image` integrates; evaluated in
    chunked numpy for grid sweeps."""
    pts = np.asarray(pts, np.float32).reshape(-1, 3)
    out = np.empty(len(pts), np.float32)
    c2 = np.sum(centers * centers, -1)
    for i in range(0, len(pts), chunk):
        p = pts[i : i + chunk]
        d2 = (
            np.sum(p * p, -1, keepdims=True) - 2.0 * p @ centers.T + c2
        )
        out[i : i + chunk] = amp * np.exp(-d2 / (2 * sigma**2)).sum(-1)
    return out


def write_gt_meshes(
    root: str,
    n_verts: int,
    n_blobs: int,
    seed: int = 0,
    level: float = 5.0,
    sigma: float = 0.045,
    amp: float = 240.0,
    voxel: float = 0.02,
    frames=None,
    subject: str = "blobs",
):
    """Emit analytic ground-truth surface meshes `object/{frame:06d}.obj`
    for an existing synthetic dataset — the GT layout the mesh evaluator
    consumes (reference mesh_evaluator.py:30,100-136), closing the
    chamfer/P2S loop end-to-end on synthetic data.

    subject="blobs": the GT surface is the `level` isosurface of the same
    Gaussian-blob density the images were volume-rendered from, so a
    perfectly trained density field extracted at `mesh_th == level`
    matches it exactly. Blob centers are recovered by replaying the
    generator's RNG (n_verts/n_blobs/seed must match generation); the
    replay is verified bit-exactly against the stored `lbs/tvertices.npy`
    before writing.

    subject="capsule": the GT surface is marching cubes at level 0 of the
    analytic posed capsule-union SDF, replayed from the stored per-frame
    `params/{f}.npy` poses — no RNG involved; n_verts/n_blobs/level/
    sigma/amp are ignored.
    """
    from ..render.mesh import marching_cubes, largest_component
    from ..evaluators.mesh import export_obj

    if subject == "capsule":
        return _write_gt_meshes_capsule(root, voxel, frames)
    rng = np.random.RandomState(seed)
    tverts, _weights = _make_vertices(
        REST_JOINTS.copy(), SMPL_PARENTS, n_verts, rng
    )
    tv_ref = np.load(os.path.join(root, "lbs", "tvertices.npy"))
    if tverts.shape != tv_ref.shape or not np.allclose(tverts, tv_ref):
        raise ValueError(
            "RNG replay mismatch: n_verts/seed do not reproduce "
            "lbs/tvertices.npy — pass the generation-time values"
        )
    blob_idx = rng.choice(len(tverts), size=min(n_blobs, len(tverts)),
                          replace=False)

    if frames is None:
        vdir = os.path.join(root, "vertices")
        frames = sorted(
            int(os.path.splitext(f)[0]) for f in os.listdir(vdir)
            if f.endswith(".npy")
        )
    # the blob shell extends r = sigma*sqrt(2 ln(amp/level)) past centers
    shell = float(sigma * np.sqrt(2.0 * np.log(max(amp / level, 1.0 + 1e-6))))
    paths = []
    for f in frames:
        wverts = np.load(os.path.join(root, "vertices", f"{f}.npy"))
        centers = wverts[blob_idx].astype(np.float32)
        lo = centers.min(0) - shell - 2 * voxel
        hi = centers.max(0) + shell + 2 * voxel
        axes = [np.arange(lo[k], hi[k] + voxel, voxel, dtype=np.float32)
                for k in range(3)]
        shape = tuple(len(a) for a in axes)
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
        dens = blob_density_np(grid, centers, sigma, amp).reshape(shape)
        verts, faces = marching_cubes(
            dens, level, spacing=(voxel,) * 3, origin=tuple(lo)
        )
        verts, faces = largest_component(verts, faces)
        path = os.path.join(root, "object", f"{f:06d}.obj")
        export_obj(path, verts, faces)
        paths.append(path)
    return paths


def _write_gt_meshes_capsule(root, voxel=0.02, frames=None):
    """Capsule-subject GT meshes: mc at level 0 of the analytic posed SDF
    (see write_gt_meshes). Poses replayed from params/{f}.npy."""
    import cv2

    from ..core.skeleton import rigid_transforms_host
    from ..render.mesh import marching_cubes, largest_component
    from ..evaluators.mesh import export_obj

    joints = np.load(os.path.join(root, "lbs", "joints.npy"))
    parents = np.load(os.path.join(root, "lbs", "parents.npy"))
    if frames is None:
        vdir = os.path.join(root, "vertices")
        frames = sorted(
            int(os.path.splitext(f)[0]) for f in os.listdir(vdir)
            if f.endswith(".npy")
        )
    paths = []
    for f in frames:
        prm = np.load(
            os.path.join(root, "params", f"{f}.npy"), allow_pickle=True
        ).item()
        poses = np.asarray(prm["poses"], np.float32).reshape(-1, 3)
        Rw = cv2.Rodrigues(np.asarray(prm["Rh"], np.float32).reshape(3))[0]
        Th = np.asarray(prm["Th"], np.float32).reshape(3)
        A, posed_joints = rigid_transforms_host(
            poses, joints, parents, return_joints=True
        )
        seg_a, seg_b, radii, _ = _capsule_world_frames(
            np.asarray(A), Rw.astype(np.float32), Th, np.asarray(posed_joints),
            joints,
        )
        ends = np.concatenate([seg_a, seg_b], 0)
        lo = ends.min(0) - radii.max() - 2 * voxel
        hi = ends.max(0) + radii.max() + 2 * voxel
        axes = [np.arange(lo[k], hi[k] + voxel, voxel, dtype=np.float32)
                for k in range(3)]
        shape = tuple(len(a) for a in axes)
        grid = np.stack(np.meshgrid(*axes, indexing="ij"), -1)
        # mc extracts {vol == level} with inside > level: negate the SDF
        sdf = capsule_union_sdf_np(grid, seg_a, seg_b, radii).reshape(shape)
        verts, tris = marching_cubes(
            -sdf, 0.0, spacing=(voxel,) * 3, origin=tuple(lo)
        )
        verts, tris = largest_component(verts, tris)
        path = os.path.join(root, "object", f"{f:06d}.obj")
        export_obj(path, verts, tris)
        paths.append(path)
    return paths
