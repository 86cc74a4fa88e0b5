"""Golden-value tests for animatable_nerf_tpu.core against independent
oracles (torch library ops, scipy, closed forms)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch
import torch.nn.functional as F
from scipy.spatial import cKDTree
from scipy.spatial.transform import Rotation

from animatable_nerf_tpu import core


# ---------------------------------------------------------------- encoding
def test_positional_encoding_matches_interleaved_sincos(rng):
    x = rng.randn(17, 3).astype(np.float32)
    multires = 10
    out = np.asarray(core.positional_encoding(jnp.asarray(x), multires))
    assert out.shape == (17, core.encoding_dim(multires))
    # oracle: explicit band-by-band construction
    chunks = [x]
    for f in 2.0 ** np.arange(multires):
        chunks.append(np.sin(x * f))
        chunks.append(np.cos(x * f))
    ref = np.concatenate(chunks, axis=-1)
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_positional_encoding_viewdir_dim():
    v = jnp.ones((5, 3))
    assert core.positional_encoding(v, 4).shape == (5, 27)


# ---------------------------------------------------------------- skeleton
def test_batch_rodrigues_vs_scipy(rng):
    poses = rng.randn(24, 3).astype(np.float32) * 0.5
    ours = np.asarray(core.batch_rodrigues(jnp.asarray(poses)))
    ref = Rotation.from_rotvec(poses).as_matrix()
    np.testing.assert_allclose(ours, ref, atol=1e-5)


def _random_skeleton(rng):
    parents = np.array(
        [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
         19, 20, 21]
    )
    joints = rng.randn(24, 3).astype(np.float32) * 0.3
    return joints, parents


def test_rigid_transforms_zero_pose_is_identity(rng):
    joints, parents = _random_skeleton(rng)
    poses = np.zeros((24, 3), dtype=np.float32)
    A = np.asarray(core.rigid_transforms(poses, joints, parents))
    # zero pose: G = A(rest) @ A(rest)^{-1} = I for every bone
    np.testing.assert_allclose(A, np.tile(np.eye(4), (24, 1, 1)), atol=1e-5)


def test_rigid_transforms_maps_rest_joints_to_posed_joints(rng):
    joints, parents = _random_skeleton(rng)
    poses = (rng.randn(24, 3) * 0.3).astype(np.float32)
    A, posed = core.rigid_transforms(
        jnp.asarray(poses), jnp.asarray(joints), parents, return_joints=True
    )
    A, posed = np.asarray(A), np.asarray(posed)
    # G_k maps the rest position of joint k to its posed position
    rest_h = np.concatenate([joints, np.ones((24, 1))], axis=1)
    mapped = np.einsum("nij,nj->ni", A, rest_h)[:, :3]
    np.testing.assert_allclose(mapped, posed, atol=1e-4)


def test_rigid_transforms_vs_independent_chain(rng):
    """Oracle: compose homogeneous transforms with scipy rotations,
    world-space formulation."""
    joints, parents = _random_skeleton(rng)
    poses = (rng.randn(24, 3) * 0.4).astype(np.float32)

    def homog(Rm, t):
        m = np.eye(4)
        m[:3, :3] = Rm
        m[:3, 3] = t
        return m

    rots = Rotation.from_rotvec(poses).as_matrix()
    world = [homog(rots[0], joints[0])]
    for i in range(1, 24):
        local = homog(rots[i], joints[i] - joints[parents[i]])
        world.append(world[parents[i]] @ local)
    world = np.stack(world)
    # remove rest-pose transform: G = world @ homog(I, joints)^{-1}
    ref = np.stack([w @ homog(np.eye(3), -j) for w, j in zip(world, joints)])

    ours = np.asarray(core.rigid_transforms(poses, joints, parents))
    np.testing.assert_allclose(ours, ref, atol=2e-4)


# ---------------------------------------------------------------- LBS
def test_inverse_3x3_vs_linalg(rng):
    from animatable_nerf_tpu.core.lbs import inverse_3x3

    m = rng.randn(64, 3, 3).astype(np.float32) + np.eye(3, dtype=np.float32) * 2
    ours = np.asarray(inverse_3x3(jnp.asarray(m)))
    ref = np.linalg.inv(m)
    np.testing.assert_allclose(ours, ref, rtol=2e-3, atol=2e-4)


def test_lbs_roundtrip(rng):
    joints, parents = _random_skeleton(rng)
    poses = (rng.randn(24, 3) * 0.3).astype(np.float32)
    A = core.rigid_transforms(poses, joints, parents)
    pts = jnp.asarray(rng.randn(128, 3).astype(np.float32))
    bw = jax.nn.softmax(jnp.asarray(rng.randn(128, 24).astype(np.float32)), -1)
    posed = core.tpose_points_to_pose_points(pts, bw, A)
    back = core.pose_points_to_tpose_points(posed, bw, A)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-3)


def test_world_pose_roundtrip(rng):
    Rh = Rotation.from_rotvec(rng.randn(3) * 0.5).as_matrix().astype(np.float32)
    Th = rng.randn(1, 3).astype(np.float32)
    w = rng.randn(50, 3).astype(np.float32)
    p = core.world_points_to_pose_points(jnp.asarray(w), jnp.asarray(Rh), jnp.asarray(Th))
    w2 = core.pose_points_to_world_points(p, jnp.asarray(Rh), jnp.asarray(Th))
    np.testing.assert_allclose(np.asarray(w2), w, atol=1e-5)


# ---------------------------------------------------------------- grid sample
def test_grid_trilerp_matches_torch_grid_sample(rng):
    """Oracle: the exact reference call pattern — normalize into bounds,
    flip xyz->zyx, F.grid_sample(align_corners=True, border) on a
    (1, C, D, H, W) volume (blend_utils.py:119-149)."""
    D, H, W, C = 9, 13, 7, 25
    vol = rng.randn(D, H, W, C).astype(np.float32)
    bounds = np.array([[-0.3, -0.9, -0.4], [0.8, 1.1, 0.5]], dtype=np.float32)
    # include points outside bounds to exercise border padding
    pts = rng.uniform(-1.4, 1.6, size=(200, 3)).astype(np.float32)

    ours = np.asarray(
        core.pts_sample_blend_weights(jnp.asarray(pts), jnp.asarray(vol), jnp.asarray(bounds))
    )

    t_vol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # (1, C, D, H, W)
    gc = (torch.from_numpy(pts) - torch.from_numpy(bounds[0])) / torch.from_numpy(
        bounds[1] - bounds[0]
    )
    gc = gc * 2 - 1
    gc = gc[..., [2, 1, 0]][None, None, None]  # (1,1,1,N,3) zyx flip
    ref = F.grid_sample(t_vol, gc, padding_mode="border", align_corners=True)
    ref = ref[0, :, 0, 0].T.numpy()  # (N, C)
    np.testing.assert_allclose(ours, ref, atol=2e-5)


# ---------------------------------------------------------------- rays
def test_near_far_analytic_center_ray():
    bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], dtype=np.float32)
    ray_o = np.array([[-5.0, 0.0, 0.0]], dtype=np.float32)
    ray_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
    near, far, mask = core.get_near_far_np(bounds, ray_o, ray_d)
    assert mask.all()
    # bounds are inflated by 0.01 (if_nerf_data_utils.py:168)
    np.testing.assert_allclose(near, [5 - 1.01], atol=1e-5)
    np.testing.assert_allclose(far, [5 + 1.01], atol=1e-5)


def test_near_far_miss():
    bounds = np.array([[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0]], dtype=np.float32)
    ray_o = np.array([[-5.0, 3.0, 0.0]], dtype=np.float32)
    ray_d = np.array([[1.0, 0.0, 0.0]], dtype=np.float32)
    _, _, mask = core.get_near_far_np(bounds, ray_o, ray_d)
    assert not mask.any()


def test_near_far_masked_matches_np(rng):
    bounds = np.array([[-0.5, -1.0, -0.3], [0.6, 0.9, 0.8]], dtype=np.float32)
    ray_o = np.tile(np.array([[0.1, 0.0, -4.0]], dtype=np.float32), (256, 1))
    d = rng.randn(256, 3).astype(np.float32)
    d = d / np.linalg.norm(d, axis=1, keepdims=True)
    near_np, far_np, mask_np = core.get_near_far_np(bounds, ray_o, d)
    near_j, far_j, mask_j = core.get_near_far_masked(
        jnp.asarray(bounds), jnp.asarray(ray_o), jnp.asarray(d)
    )
    near_j, far_j, mask_j = map(np.asarray, (near_j, far_j, mask_j))
    np.testing.assert_array_equal(mask_j, mask_np)
    np.testing.assert_allclose(near_j[mask_j], near_np, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(far_j[mask_j], far_np, rtol=1e-4, atol=1e-5)


# ---------------------------------------------------------------- sampling
def test_stratified_z_vals_deterministic():
    near = jnp.array([1.0, 2.0])
    far = jnp.array([3.0, 6.0])
    z = core.stratified_z_vals(near, far, 5, perturb=False)
    np.testing.assert_allclose(np.asarray(z[0]), [1.0, 1.5, 2.0, 2.5, 3.0], atol=1e-6)
    np.testing.assert_allclose(np.asarray(z[1]), [2.0, 3.0, 4.0, 5.0, 6.0], atol=1e-6)


def test_stratified_z_vals_perturb_within_intervals():
    near = jnp.zeros((64,))
    far = jnp.ones((64,))
    z = core.stratified_z_vals(near, far, 16, key=jax.random.PRNGKey(0), perturb=True)
    z = np.asarray(z)
    assert (np.diff(z, axis=-1) > -1e-6).all()
    assert (z >= 0).all() and (z <= 1).all()


def test_dists_last_repeated():
    z = jnp.array([[0.0, 1.0, 3.0]])
    d = np.asarray(core.z_vals_to_dists(z))
    np.testing.assert_allclose(d, [[1.0, 2.0, 2.0]])


# ---------------------------------------------------------------- composite
def test_raw2outputs_matches_torch_formula(rng):
    raw = rng.rand(32, 8, 4).astype(np.float32)
    z = np.sort(rng.rand(32, 8).astype(np.float32), axis=-1)
    rgb_map, disp, acc, w, depth = core.raw2outputs(jnp.asarray(raw), jnp.asarray(z))

    t_raw, t_z = torch.from_numpy(raw), torch.from_numpy(z)
    alpha = t_raw[..., -1]
    tw = alpha * torch.cumprod(
        torch.cat([torch.ones((32, 1)), 1.0 - alpha + 1e-10], -1), -1
    )[:, :-1]
    t_rgb = torch.sum(tw[..., None] * t_raw[..., :-1], -2)
    t_depth = torch.sum(tw * t_z, -1)
    t_acc = torch.sum(tw, -1)
    np.testing.assert_allclose(np.asarray(rgb_map), t_rgb.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(w), tw.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(depth), t_depth.numpy(), atol=1e-5)
    np.testing.assert_allclose(np.asarray(acc), t_acc.numpy(), atol=1e-5)


def test_raw2outputs_white_bkgd():
    raw = jnp.zeros((4, 8, 4))
    rgb_map, *_ = core.raw2outputs(raw, jnp.linspace(0, 1, 8)[None].repeat(4, 0), True)
    np.testing.assert_allclose(np.asarray(rgb_map), 1.0, atol=1e-6)


def test_sample_pdf_deterministic_uniform_weights():
    bins = jnp.linspace(0.0, 1.0, 9)[None].repeat(3, 0)
    weights = jnp.ones((3, 8))
    s = core.sample_pdf(bins, weights, 16, det=True)
    s = np.asarray(s)
    assert s.shape == (3, 16)
    assert (np.diff(s, axis=-1) >= -1e-6).all()
    np.testing.assert_allclose(s[:, 0], 0.0, atol=1e-4)
    np.testing.assert_allclose(s[:, -1], 1.0, atol=1e-4)


def test_intersection_mask():
    sdf = jnp.array([[1.0, 0.5, -0.5, -1.0], [1.0, 0.5, 0.2, 0.1]])
    z = jnp.zeros_like(sdf)
    mask, ind = core.get_intersection_mask(sdf, z)
    assert bool(mask[0]) and not bool(mask[1])
    assert int(ind[0]) == 1  # crossing between samples 1 and 2


# ---------------------------------------------------------------- knn
def test_knn_blend_weights_vs_scipy(rng):
    ref_pts = rng.randn(500, 3).astype(np.float32)
    values = rng.rand(500, 24).astype(np.float32)
    src = rng.randn(64, 3).astype(np.float32)

    sampled, dists = core.sample_blend_closest_points(
        jnp.asarray(src), jnp.asarray(ref_pts), jnp.asarray(values)
    )
    sampled, dists = np.asarray(sampled), np.asarray(dists)

    tree = cKDTree(ref_pts)
    d, idx = tree.query(src, k=5)
    disp = 1.0 / (d + 1e-8)
    w = disp / disp.sum(-1, keepdims=True)
    ref_sampled = np.einsum("nkc,nk->nc", values[idx], w)
    ref_dists = np.sum(d * w, axis=-1, keepdims=True)
    np.testing.assert_allclose(sampled, ref_sampled, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(dists, ref_dists, rtol=1e-3, atol=1e-4)


def test_knn_batched(rng):
    src = rng.randn(2, 32, 3).astype(np.float32)
    ref_pts = rng.randn(2, 100, 3).astype(np.float32)
    values = rng.rand(2, 100, 24).astype(np.float32)
    sampled, dists = core.sample_blend_closest_points(
        jnp.asarray(src), jnp.asarray(ref_pts), jnp.asarray(values)
    )
    assert sampled.shape == (2, 32, 24)
    assert dists.shape == (2, 32, 1)


# ---------------------------------------------------------------- sdf
def test_volsdf_sigma_piecewise():
    beta = 0.1
    sdf = jnp.array([-0.05, 0.0, 0.05])
    out = np.asarray(core.volsdf_sigma(sdf, beta))
    # sdf < 0 => x > 0 branch; sdf > 0 => x <= 0 branch
    np.testing.assert_allclose(
        out[0], 1 / beta * (1 - 0.5 * np.exp(-0.05 / beta)), rtol=1e-5
    )
    np.testing.assert_allclose(out[1], 0.5 / beta, rtol=1e-5)
    np.testing.assert_allclose(out[2], 0.5 / beta * np.exp(-0.05 / beta), rtol=1e-5)


def test_sigma_to_alpha_monotone():
    s = jnp.array([0.0, 1.0, 100.0, 1e5])
    a = np.asarray(core.sigma_to_alpha(s))
    assert a[0] == 0.0 and (np.diff(a) >= 0).all() and a[-1] <= 1.0


def test_neus_alpha_surface_crossing():
    from animatable_nerf_tpu.core.sdf import neus_alpha

    sdf = jnp.array([[2.0, 0.25, -0.25, -0.5]])
    a = np.asarray(neus_alpha(sdf, 50.0))
    assert a.shape == (1, 4)
    assert a[0, 0] < 0.1  # well outside the surface: transparent
    assert a[0, 1] > 0.9  # crossing interval has high opacity


class TestPackedTrilerp:
    def test_matches_unpacked(self, rng):
        import jax.numpy as jnp
        from animatable_nerf_tpu.core.grid import (
            pack_corner_volume,
            pts_sample_blend_weights,
            pts_sample_blend_weights_packed,
        )

        vol = jnp.asarray(rng.rand(9, 7, 5, 25).astype(np.float32))
        bounds = jnp.asarray(
            np.array([[-0.4, -0.3, -0.2], [0.5, 0.6, 0.7]], np.float32)
        )
        # include out-of-bounds points (border clamp) and exact corners
        pts = jnp.asarray(
            np.concatenate(
                [
                    (rng.rand(200, 3) * 1.4 - 0.55).astype(np.float32),
                    np.array([[-0.4, -0.3, -0.2], [0.5, 0.6, 0.7]], np.float32),
                ]
            )
        )
        want = pts_sample_blend_weights(pts, vol, bounds)
        packed = pack_corner_volume(vol)
        assert packed.shape == (8, 6, 4, 200)
        got = pts_sample_blend_weights_packed(pts, packed, bounds, 25)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-5
        )


class TestSphereTracing:
    def test_unit_sphere_intersections(self, rng):
        import jax.numpy as jnp
        from animatable_nerf_tpu.core.sdf import sphere_tracing

        # rays from z=-2 toward the unit sphere at origin
        R, S = 16, 32
        dirs = rng.randn(R, 3).astype(np.float32) * 0.1
        dirs[:, 2] = 1.0
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        ray_o = np.tile(np.array([[0, 0, -2.0]], np.float32), (R, 1))
        z = np.linspace(0.5, 3.5, S, dtype=np.float32)
        z_vals = np.tile(z, (R, 1))
        wpts = ray_o[:, None] + dirs[:, None] * z_vals[..., None]

        def sdf_fn(p):
            return jnp.linalg.norm(p, axis=-1) - 1.0

        sdf = np.asarray(sdf_fn(jnp.asarray(wpts)))
        pts, zs, mask = sphere_tracing(
            jnp.asarray(wpts), jnp.asarray(sdf),
            jnp.asarray(ray_o), jnp.asarray(dirs), sdf_fn,
        )
        m = np.asarray(mask)
        assert m.sum() > R // 2  # most rays hit
        hit = np.asarray(pts)[m]
        np.testing.assert_allclose(
            np.linalg.norm(hit, axis=-1), 1.0, atol=1e-3
        )
        # refined z reproduces the point along the ray
        recon = ray_o[m] + dirs[m] * np.asarray(zs)[m][:, None]
        np.testing.assert_allclose(recon, hit, atol=5e-3)


def test_backward_warp_finite_at_singular_blend():
    """A 50/50 blend of Rz(0) and Rz(pi) has a singular rotation block;
    the det-clamped backward warp must stay finite in value AND gradient
    (the un-clamped inverse's derivative overflows f32 near det=0 and
    NaN-poisoned a real training run through where-masking)."""
    from animatable_nerf_tpu.core.lbs import (
        pose_points_to_tpose_points, inverse_3x3,
    )

    A = np.zeros((24, 4, 4), np.float32)
    for k in range(24):
        A[k] = np.eye(4)
    A[1][:3, :3] = np.array([[-1, 0, 0], [0, -1, 0], [0, 0, 1]], np.float32)
    bw = np.zeros((4, 24), np.float32)
    bw[:, 0] = 0.5
    bw[:, 1] = 0.5  # rank-1 blended rotation: diag(0, 0, 1)
    pts = np.array(
        [[0.3, -0.2, 0.1]] * 4, np.float32
    )

    def f(bw_):
        out = pose_points_to_tpose_points(
            jnp.asarray(pts), bw_, jnp.asarray(A)
        )
        return jnp.sum(out * 0.0)  # zero cotangent, like a masked point

    val = pose_points_to_tpose_points(
        jnp.asarray(pts), jnp.asarray(bw), jnp.asarray(A)
    )
    assert np.isfinite(np.asarray(val)).all()
    g = jax.grad(f)(jnp.asarray(bw))
    assert np.isfinite(np.asarray(g)).all()
    # exactness away from the clamp: a healthy rotation is untouched
    m = np.asarray(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32
    )
    np.testing.assert_allclose(
        np.asarray(inverse_3x3(jnp.asarray(m), det_eps=1e-6)),
        np.linalg.inv(m), atol=1e-6,
    )


def test_safe_sqrt_and_safe_norm_zero_subgradient():
    """Value-identical to sqrt/norm everywhere, finite (zero) gradient
    at exactly 0 — where jnp.sqrt's derivative is inf and one masked
    coincident point NaN-poisons a whole backward pass."""
    from animatable_nerf_tpu.core.numerics import safe_sqrt, safe_norm

    x = jnp.asarray([0.0, 1e-12, 0.25, 4.0])
    np.testing.assert_allclose(
        np.asarray(safe_sqrt(x)), np.sqrt(np.asarray(x)), rtol=1e-7
    )
    g = jax.grad(lambda v: jnp.sum(safe_sqrt(v)))(x)
    assert np.isfinite(np.asarray(g)).all()
    assert float(g[0]) == 0.0
    np.testing.assert_allclose(float(g[3]), 0.25, rtol=1e-6)
    # garbage must STAY garbage: NaN distances mark points the filters
    # must mask out; mapping NaN -> 0 would keep an inf-coordinate point
    bad = np.asarray(safe_sqrt(jnp.asarray([np.nan, np.inf])))
    assert np.isnan(bad[0]) and np.isinf(bad[1])

    v = jnp.asarray([[0.0, 0.0, 0.0], [3.0, 4.0, 0.0]])
    np.testing.assert_allclose(np.asarray(safe_norm(v)), [0.0, 5.0], rtol=1e-6)
    gn = jax.grad(lambda u: jnp.sum(safe_norm(u)))(v)
    assert np.isfinite(np.asarray(gn)).all()
    assert np.abs(np.asarray(gn)[0]).sum() == 0.0


def test_knn_blend_gradient_finite_at_coincident_point():
    """A query EXACTLY on a reference vertex (substitute_masked plants
    masked points on pvertices[0]) has KNN distance 0; the sampler's
    backward must stay finite (sqrt'(0) = inf NaN-poisoned a real
    AlignedLBW training run at step 812, jit-only: fusion rounding
    decided whether d^2 was exactly 0)."""
    from animatable_nerf_tpu.core.knn import sample_blend_closest_points

    r = np.random.RandomState(0)
    ref = r.randn(32, 3).astype(np.float32)
    vals = r.rand(32, 24).astype(np.float32)
    src = np.stack([ref[0], ref[7] + 0.05], 0).astype(np.float32)

    def f(s):
        sampled, wd = sample_blend_closest_points(
            s, jnp.asarray(ref), jnp.asarray(vals)
        )
        return jnp.sum(sampled) + jnp.sum(wd)

    for fn in (jax.grad(f), jax.jit(jax.grad(f))):
        g = np.asarray(fn(jnp.asarray(src)))
        assert np.isfinite(g).all()
    # value parity with the scipy/numpy oracle away from the kink
    sampled, wd = sample_blend_closest_points(
        jnp.asarray(src), jnp.asarray(ref), jnp.asarray(vals)
    )
    d = np.linalg.norm(src[1][None] - ref, axis=-1)
    idx = np.argsort(d)[:5]
    disp = 1.0 / (d[idx] + 1e-8)
    w = disp / disp.sum()
    np.testing.assert_allclose(
        np.asarray(sampled)[1], (vals[idx] * w[:, None]).sum(0), rtol=1e-4
    )
