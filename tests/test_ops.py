"""Tests for the ops layer: Pallas kernels (interpret mode on CPU) vs
their pure-XLA twins, and pointnet2 / rasterizer semantics vs naive
numpy oracles mirroring the reference CUDA kernels."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animatable_nerf_tpu.core.knn import sample_blend_closest_points
from animatable_nerf_tpu.ops.knn_pallas import knn_blend_pallas
from animatable_nerf_tpu.ops.mlp_pallas import (
    fused_skip_mlp,
    make_fused_skip_mlp,
    _ref_forward,
    flax_skipmlp_layers,
)
from animatable_nerf_tpu.ops import pointnet2 as pn2
from animatable_nerf_tpu.ops.rasterize import rasterize_points


class TestKNNPallas:
    def test_matches_xla_twin(self, rng):
        src = rng.randn(300, 3).astype(np.float32)
        ref = rng.randn(500, 3).astype(np.float32)
        vals = rng.rand(500, 24).astype(np.float32)
        want_s, want_d = sample_blend_closest_points(
            jnp.asarray(src), jnp.asarray(ref), jnp.asarray(vals)
        )
        got_s, got_d = knn_blend_pallas(
            jnp.asarray(src), jnp.asarray(ref), jnp.asarray(vals),
            tile=128, interpret=True,
        )
        np.testing.assert_allclose(got_s, want_s, rtol=2e-4, atol=2e-5)
        np.testing.assert_allclose(got_d, want_d, rtol=2e-4, atol=2e-5)

    def test_padding_is_exact(self, rng):
        # N not a tile multiple, M not a lane multiple
        src = rng.randn(57, 3).astype(np.float32)
        ref = rng.randn(131, 3).astype(np.float32)
        vals = rng.rand(131, 24).astype(np.float32)
        want_s, _ = sample_blend_closest_points(
            jnp.asarray(src), jnp.asarray(ref), jnp.asarray(vals)
        )
        got_s, _ = knn_blend_pallas(
            jnp.asarray(src), jnp.asarray(ref), jnp.asarray(vals),
            tile=128, interpret=True,
        )
        np.testing.assert_allclose(got_s, want_s, rtol=2e-4, atol=2e-5)


class TestFusedMLP:
    def _layers(self, rng, dims, key=0):
        out = []
        for din, dout in zip(dims[:-1], dims[1:]):
            w = (rng.randn(din, dout) * 0.2).astype(np.float32)
            b = (rng.randn(dout) * 0.1).astype(np.float32)
            out.append((jnp.asarray(w), jnp.asarray(b)))
        return out

    def test_plain_stack(self, rng):
        layers = self._layers(rng, [63, 256, 256, 24])
        x = jnp.asarray(rng.randn(100, 63).astype(np.float32))
        want = _ref_forward(x, layers, (), "relu")
        got = fused_skip_mlp(x, layers, tile=128, interpret=True)
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_skip_stack_matches_flax(self, rng):
        from animatable_nerf_tpu.fields.mlp import SkipMLP

        mlp = SkipMLP(depth=4, width=64, out_dim=16, skips=(2,))
        x = jnp.asarray(rng.randn(40, 39).astype(np.float32))
        params = mlp.init(jax.random.PRNGKey(0), x)["params"]
        want = mlp.apply({"params": params}, x)
        layers = flax_skipmlp_layers(params, depth=4)
        got = fused_skip_mlp(
            x, layers, skips=(2,), tile=128, interpret=True
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_softplus_act(self, rng):
        layers = self._layers(rng, [30, 64, 64, 8])
        x = jnp.asarray(rng.randn(20, 30).astype(np.float32))
        want = _ref_forward(x, layers, (), "softplus")
        got = fused_skip_mlp(
            x, layers, act="softplus", tile=128, interpret=True
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    def test_custom_vjp_backward(self, rng):
        layers = self._layers(rng, [16, 32, 32, 4])
        x = jnp.asarray(rng.randn(24, 16).astype(np.float32))
        f = make_fused_skip_mlp(skips=(), act="relu")
        want_g = jax.grad(
            lambda xx: jnp.sum(_ref_forward(xx, layers, (), "relu") ** 2)
        )(x)
        got_g = jax.grad(lambda xx: jnp.sum(f(xx, layers) ** 2))(x)
        np.testing.assert_allclose(got_g, want_g, rtol=1e-5, atol=1e-5)


class TestPointnet2:
    def test_fps_maxmin_property(self, rng):
        xyz = jnp.asarray(rng.randn(2, 64, 3).astype(np.float32))
        idx = pn2.furthest_point_sample(xyz, 8)
        assert idx.shape == (2, 8)
        # seed point is index 0; no duplicates
        assert int(idx[0, 0]) == 0
        for b in range(2):
            assert len(set(np.asarray(idx[b]).tolist())) == 8

    def test_fps_matches_naive(self, rng):
        xyz = rng.randn(1, 40, 3).astype(np.float32)
        got = np.asarray(pn2.furthest_point_sample(jnp.asarray(xyz), 6))[0]
        # naive greedy
        pts = xyz[0]
        chosen = [0]
        mind = np.full(40, np.inf)
        for _ in range(5):
            d = np.sum((pts - pts[chosen[-1]]) ** 2, -1)
            mind = np.minimum(mind, d)
            chosen.append(int(np.argmax(mind)))
        assert got.tolist() == chosen

    def test_ball_query_semantics(self, rng):
        xyz = rng.randn(1, 50, 3).astype(np.float32)
        new_xyz = xyz[:, :4]
        radius, nsample = 0.8, 6
        got = np.asarray(
            pn2.ball_query(radius, nsample, jnp.asarray(xyz),
                           jnp.asarray(new_xyz))
        )[0]
        for s in range(4):
            d2 = np.sum((xyz[0] - new_xyz[0, s]) ** 2, -1)
            inball = np.where(d2 < radius**2)[0]
            want = inball[:nsample].tolist()
            if len(want) == 0:
                want = [0] * nsample
            while len(want) < nsample:
                want.append(want[0])
            assert got[s].tolist() == want

    def test_three_interpolate(self, rng):
        unknown = jnp.asarray(rng.randn(1, 10, 3).astype(np.float32))
        known = jnp.asarray(rng.randn(1, 7, 3).astype(np.float32))
        feats = jnp.asarray(rng.randn(1, 7, 5).astype(np.float32))
        dist, idx = pn2.three_nn(unknown, known)
        w = pn2.interpolation_weights(dist)
        out = pn2.three_interpolate(feats, idx, w)
        assert out.shape == (1, 10, 5)
        # exact-hit query interpolates to (approx) the known feature
        unknown2 = known[:, :1]
        d2, i2 = pn2.three_nn(unknown2, known)
        w2 = pn2.interpolation_weights(d2)
        out2 = pn2.three_interpolate(feats, i2, w2)
        np.testing.assert_allclose(out2[0, 0], feats[0, 0], atol=1e-4)

    def test_group_and_gather(self, rng):
        pts = jnp.asarray(rng.randn(2, 9, 4).astype(np.float32))
        idx = jnp.asarray(rng.randint(0, 9, (2, 3, 5)).astype(np.int32))
        grouped = pn2.group_points(pts, idx)
        assert grouped.shape == (2, 3, 5, 4)
        np.testing.assert_allclose(
            grouped[1, 2, 3], pts[1, int(idx[1, 2, 3])]
        )


class TestRasterize:
    def _cam(self, H, W):
        K = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
        R = np.eye(3, dtype=np.float32)
        T = np.zeros((3, 1), np.float32)
        return K, R, T

    def test_depth_test_picks_nearest(self):
        H = W = 16
        K, R, T = self._cam(H, W)
        # two points projecting to the same pixel, different depths
        pts = np.array([[0.0, 0.0, 2.0], [0.0, 0.0, 1.0]], np.float32)
        feats = np.array([[10.0], [20.0]], np.float32)
        out = rasterize_points(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(K),
            jnp.asarray(R), jnp.asarray(T), H, W,
        )
        cy, cx = H // 2, W // 2
        assert float(out["depth"][cy, cx]) == pytest.approx(1.0)
        assert int(out["index"][cy, cx]) == 1
        assert float(out["feature_map"][cy, cx, 0]) == pytest.approx(20.0)

    def test_offscreen_and_empty(self):
        H = W = 8
        K, R, T = self._cam(H, W)
        pts = np.array([[100.0, 100.0, 1.0], [0.0, 0.0, -1.0]], np.float32)
        feats = np.ones((2, 3), np.float32)
        out = rasterize_points(
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(K),
            jnp.asarray(R), jnp.asarray(T), H, W,
        )
        assert not bool(out["mask"].any())
        assert float(jnp.abs(out["feature_map"]).sum()) == 0.0

    def test_feature_gradients_flow(self):
        H = W = 8
        K, R, T = self._cam(H, W)
        pts = jnp.asarray(
            np.array([[0.0, 0.0, 1.0]], np.float32)
        )
        feats = jnp.asarray(np.array([[3.0]], np.float32))

        def loss(f):
            out = rasterize_points(
                pts, f, jnp.asarray(K), jnp.asarray(R), jnp.asarray(T),
                H, W, splat_radius=0,  # single-pixel footprint
            )
            return jnp.sum(out["feature_map"] ** 2)

        g = jax.grad(loss)(feats)
        assert float(g[0, 0]) == pytest.approx(6.0)


def test_min_dist_pallas_interpret_matches_xla():
    """min_dist_pallas (the eval filter's min-distance-only kernel) vs
    the chunked XLA twin and a brute-force oracle, interpret mode."""
    from animatable_nerf_tpu.ops.knn_pallas import (
        min_dist_pallas, nearest_distance_fused,
    )

    rng = np.random.RandomState(7)
    src = jnp.asarray(rng.randn(300, 3).astype(np.float32))
    ref = jnp.asarray(rng.randn(97, 3).astype(np.float32))
    oracle = np.sqrt(
        ((np.asarray(src)[:, None] - np.asarray(ref)[None]) ** 2)
        .sum(-1).min(-1)
    )
    out = np.asarray(min_dist_pallas(src, ref, interpret=True))
    np.testing.assert_allclose(out, oracle, rtol=1e-5, atol=1e-6)
    out2 = np.asarray(nearest_distance_fused(src, ref, chunk=128))
    np.testing.assert_allclose(out2, oracle, rtol=1e-5, atol=1e-6)
    # the min distance lower-bounds the IDW-weighted KNN distance (the
    # conservative-filter invariant, models/pdf.py _compact_inputs)
    from animatable_nerf_tpu.core.knn import sample_blend_closest_points

    vals = jnp.asarray(rng.rand(97, 24).astype(np.float32))
    _, wd = sample_blend_closest_points(src, ref, vals)
    assert np.all(out <= np.asarray(wd)[:, 0] + 1e-6)


def test_pdist_grid_payload_conservative():
    """build_pdist_payload + grid_pdist_keep: the packed bf16 distance
    grid's keep set must contain EVERY point whose exact nearest-vertex
    distance is below threshold (the pass-1 superset contract), for
    queries inside and outside the grid bounds."""
    import functools
    from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload
    from animatable_nerf_tpu.models.common import grid_pdist_keep

    rng = np.random.RandomState(11)
    verts = jnp.asarray((rng.randn(120, 3) * 0.3).astype(np.float32))
    packed, margin, bounds = jax.jit(
        functools.partial(build_pdist_payload, res=16)
    )(verts)
    assert packed.dtype == jnp.bfloat16
    assert packed.shape == (15, 15, 15, 8)

    # queries: a shell around the cloud plus far-outside points (border
    # clamp must stay conservative via the convex-projection argument)
    q = np.concatenate([
        rng.randn(4000, 3).astype(np.float32) * 0.45,
        rng.randn(200, 3).astype(np.float32) * 3.0,
    ])
    exact = np.sqrt(
        ((q[:, None] - np.asarray(verts)[None]) ** 2).sum(-1).min(-1)
    )
    frame = {"pdist_packed": packed, "pdist_margin": margin,
             "pdist_bounds": bounds}
    for th in (0.05, 0.1, 0.3):
        keep = np.asarray(grid_pdist_keep(jnp.asarray(q), frame, th))
        assert keep[exact < th].all(), (
            f"grid pass-1 dropped exact survivors at th={th}"
        )
        # and it should not degenerate to keep-everything: every kept
        # IN-BOUNDS point is within the certified widened shell
        # th + 2*margin (+ bf16/f32 slack), except the single forced
        # argmin. (Out-of-bounds queries clamp to the border and may be
        # over-kept — conservative by the convex-projection argument —
        # but eval samples lie inside the padded body box.)
        b = np.asarray(bounds)
        inb = ((q >= b[0]) & (q <= b[1])).all(-1)
        slack = (th + float(margin)) * (1 + 2 ** -7) + 1e-4
        far_kept = keep & inb & (exact > slack + float(margin))
        assert far_kept.sum() <= 1


def test_d5_payload_upper_bound():
    """build_d5_payload + grid_d5_upper: the certified bound must be >=
    the exact 5th-nearest distance everywhere (it drives the blocked
    kernel's block cull — an underestimate would drop true neighbors)."""
    import functools
    from animatable_nerf_tpu.ops.knn_pallas import build_d5_payload
    from animatable_nerf_tpu.models.common import grid_d5_upper

    rng = np.random.RandomState(5)
    verts = jnp.asarray((rng.randn(150, 3) * 0.3).astype(np.float32))
    packed, bounds = jax.jit(
        functools.partial(build_d5_payload, res=16)
    )(verts)
    q = np.concatenate([
        rng.randn(3000, 3).astype(np.float32) * 0.45,
        rng.randn(100, 3).astype(np.float32) * 2.0,
    ])
    d2 = ((q[:, None] - np.asarray(verts)[None]) ** 2).sum(-1)
    exact_d5 = np.sqrt(np.sort(d2, axis=-1)[:, 4])
    frame = {"d5_packed": packed, "pdist_bounds": bounds}
    ub = np.asarray(grid_d5_upper(jnp.asarray(q), frame))
    assert (ub >= exact_d5 - 1e-5).all(), (
        f"d5 bound underestimates by {np.max(exact_d5 - ub)}"
    )
    # and it is not uselessly loose for in-bounds queries
    b = np.asarray(bounds)
    inb = ((q >= b[0]) & (q <= b[1])).all(-1)
    assert np.median(ub[inb] - exact_d5[inb]) < 0.2


def test_knn_blocked_matches_twin_interpret():
    """knn_blend_blocked (interpret mode) == the XLA twin on random
    clouds: the Morton sort, block bboxes, d5-radius cull and the
    insertion-register top-k must reproduce the exact KNN."""
    from animatable_nerf_tpu.core.knn import sample_blend_closest_points
    from animatable_nerf_tpu.ops.knn_pallas import (
        build_knn_blocks, knn_blend_blocked,
    )

    rng = np.random.RandomState(7)
    M, C, N = 700, 24, 600
    verts = jnp.asarray((rng.randn(M, 3) * 0.3).astype(np.float32))
    w = rng.rand(M, C).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    w = jnp.asarray(w)
    q = jnp.asarray((rng.randn(N, 3) * 0.35).astype(np.float32))

    want_v, want_d = sample_blend_closest_points(q, verts, w)

    kv, kw, kb = build_knn_blocks(verts, w, block=128)
    # exact d5 as the radius bound (the payload bound is looser but
    # certified; exactness of the cull only needs ub >= d5)
    d2 = ((np.asarray(q)[:, None] - np.asarray(verts)[None]) ** 2).sum(-1)
    d5 = jnp.asarray(np.sqrt(np.sort(d2, axis=-1)[:, 4]) + 1e-5)
    got_v, got_d = knn_blend_blocked(
        q, d5, kv, kw, kb, tile=256, interpret=True
    )
    # vs the twin: the twin's MXU-HIGHEST matmul d2 differs from the
    # kernels' exact VPU differences by ~1e-7, flipping near-tie
    # neighbors — tolerate the tiny resulting deltas
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-4, atol=1e-5
    )
    # vs the FLAT Pallas kernel (identical d2 arithmetic): tight
    from animatable_nerf_tpu.ops.knn_pallas import knn_blend_pallas

    flat_v, flat_d = knn_blend_pallas(q, verts, w, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(flat_v), rtol=1e-6, atol=1e-7
    )
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(flat_d), rtol=1e-6, atol=1e-7
    )


def test_knn_blocked_with_payload_bound_interpret():
    """End-to-end blocked dispatch with the PAYLOAD d5 bound (the
    production configuration): still exact vs the twin."""
    import functools
    from animatable_nerf_tpu.core.knn import sample_blend_closest_points
    from animatable_nerf_tpu.ops.knn_pallas import (
        build_knn_blocks, build_d5_payload, knn_blend_blocked,
    )
    from animatable_nerf_tpu.models.common import grid_d5_upper

    rng = np.random.RandomState(9)
    M, C, N = 512, 24, 500
    verts = jnp.asarray((rng.randn(M, 3) * 0.3).astype(np.float32))
    w = jnp.asarray(rng.rand(M, C).astype(np.float32))
    q = jnp.asarray((rng.randn(N, 3) * 0.4).astype(np.float32))
    want_v, want_d = sample_blend_closest_points(q, verts, w)
    packed, bounds = jax.jit(
        functools.partial(build_d5_payload, res=12)
    )(verts)
    d5ub = grid_d5_upper(q, {"d5_packed": packed, "pdist_bounds": bounds})
    kv, kw, kb = build_knn_blocks(verts, w, block=128)
    got_v, got_d = knn_blend_blocked(q, d5ub, kv, kw, kb, interpret=True)
    np.testing.assert_allclose(
        np.asarray(got_v), np.asarray(want_v), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(got_d), np.asarray(want_d), rtol=1e-4, atol=1e-5
    )


def test_knn_celled_bitexact_on_survivors_interpret():
    """knn_blend_celled (interpret) is BIT-exact vs the flat Pallas
    kernel for every query that can pass the weighted filter (the
    build certifies list completeness there via the 1-Lipschitz d5
    bound), conservative (wdist >= flat) everywhere else, and returns a
    finite valid-simplex blend even for far/fallback queries."""
    from animatable_nerf_tpu.ops.knn_pallas import (
        build_cell_knn, knn_blend_celled, knn_blend_pallas,
    )

    rng = np.random.RandomState(0)
    M, N = 800, 4096
    verts = rng.randn(M, 3).astype(np.float32)
    verts /= np.linalg.norm(verts, axis=-1, keepdims=True)
    verts *= 0.5
    vals = rng.rand(M, 24).astype(np.float32)
    vals /= vals.sum(-1, keepdims=True)
    q = verts[rng.randint(0, M, N)] + rng.randn(N, 3).astype(
        np.float32) * 0.06
    q[:16] = 5.0                      # far outside the grid bounds
    verts[10] = verts[11]             # exact coincident-vertex tie
    q[100] = verts[10] + 0.001

    payload, ovf = jax.jit(
        lambda v, w: build_cell_knn(v, w, res=(8, 8, 8), cap=800,
                                    slot_cap=512)
    )(jnp.asarray(verts), jnp.asarray(vals))
    assert not bool(ovf)
    got_v, got_d = knn_blend_celled(
        jnp.asarray(q), payload["cknn_verts"], payload["cknn_vals"],
        payload["cknn_lut"], payload["cknn_bounds"], interpret=True,
    )
    flat_v, flat_d = knn_blend_pallas(
        jnp.asarray(q), jnp.asarray(verts), jnp.asarray(vals),
        interpret=True,
    )
    got_v, got_d, flat_v, flat_d = map(
        np.asarray, (got_v, got_d, flat_v, flat_d)
    )
    keep = flat_d[:, 0] < 0.1
    assert keep.sum() > 1000
    np.testing.assert_array_equal(got_v[keep], flat_v[keep])
    np.testing.assert_array_equal(got_d[keep], flat_d[keep])
    assert float((got_d[~keep] - flat_d[~keep]).min()) >= 0.0
    assert np.isfinite(got_v).all() and np.isfinite(got_d).all()
    s = got_v.sum(-1)
    np.testing.assert_allclose(s, 1.0, atol=1e-4)


def test_knn_celled_overflow_flag():
    """Candidate lists that exceed `cap` (or more survivor-possible
    cells than `slot_cap`) must raise the frame-level overflow flag —
    the engine then keeps the flat kernel for the frame."""
    from animatable_nerf_tpu.ops.knn_pallas import build_cell_knn

    rng = np.random.RandomState(1)
    verts = jnp.asarray((rng.randn(500, 3) * 0.05).astype(np.float32))
    vals = jnp.asarray(rng.rand(500, 24).astype(np.float32))
    # a dense blob: every cell near it needs ~all vertices -> cap 64
    # must overflow
    _, ovf = jax.jit(
        lambda v, w: build_cell_knn(v, w, res=(6, 6, 6), cap=64,
                                    slot_cap=8)
    )(verts, vals)
    assert bool(ovf)
