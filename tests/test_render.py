"""Renderer tests: fused ray batches, tiled image sweeps, visibility
carving and isosurface extraction."""

import pytest
import numpy as np
import jax
import jax.numpy as jnp

from animatable_nerf_tpu import models
from animatable_nerf_tpu.render import (
    RenderSettings,
    render_rays,
    render_image,
    pad_rays,
    prepare_inside_mask,
    marching_cubes,
)
from animatable_nerf_tpu.render.mesh import density_grid_sweep, largest_component

from test_models import make_frame


def make_ray_batch(rng, n):
    d = rng.randn(n, 3).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return {
        "ray_o": jnp.asarray(np.tile([[0, 0, -2.0]], (n, 1)).astype(np.float32)),
        "ray_d": jnp.asarray(d),
        "near": jnp.full((n,), 1.0),
        "far": jnp.full((n,), 3.0),
        "mask": jnp.ones((n,), bool),
        "occupancy": jnp.asarray(rng.randint(0, 2, n)),
    }


def test_render_rays_train_and_losses_tensors():
    rng = np.random.RandomState(0)
    frame = make_frame(rng)
    rays = make_ray_batch(rng, 16)
    m = models.SDFPDF(num_latents=3)
    s = RenderSettings(n_samples=8)
    wpts = jnp.zeros((16, 8, 3))
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0), wpts, rays["ray_d"], jnp.ones((16, 8)), frame
    ))()
    out = jax.jit(
        lambda p: render_rays(m, p, rays, frame, s, key=jax.random.PRNGKey(1))
    )(params)
    assert out["rgb_map"].shape == (16, 3)
    assert out["msk_sdf"].shape == (16,)
    assert out["msk_free"].dtype == bool
    assert bool(jnp.isfinite(out["rgb_map"]).all())


def test_render_image_tiled_matches_render_rays():
    rng = np.random.RandomState(1)
    frame = make_frame(rng)
    rays = make_ray_batch(rng, 24)
    m = models.AniNeRF(num_train_frames=3)
    s = RenderSettings(n_samples=8, perturb=False, eval_tile=8)
    wpts = jnp.zeros((24, 8, 3))
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0), wpts, rays["ray_d"], jnp.ones((24, 8)), frame
    ))()
    full = jax.jit(lambda p: render_rays(m, p, rays, frame, s, train=False))(params)
    np_rays = {k: np.asarray(v) for k, v in rays.items()}
    padded, n = pad_rays(np_rays, s.eval_tile)
    padded = {k: jnp.asarray(v) for k, v in padded.items()}
    tiled = jax.jit(lambda p: render_image(m, p, padded, frame, s))(params)
    np.testing.assert_allclose(
        np.asarray(tiled["rgb_map"])[:n],
        np.asarray(full["rgb_map"]),
        atol=1e-5,
    )


def test_pad_rays_multiple():
    rng = np.random.RandomState(2)
    rays = {k: np.asarray(v) for k, v in make_ray_batch(rng, 10).items()}
    padded, n = pad_rays(rays, 8)
    assert n == 10
    assert padded["ray_o"].shape[0] == 16
    assert padded["mask"][:10].all() and not padded["mask"][10:].any()


def test_importance_coarse_overflow_propagates():
    """With hierarchical sampling, the coarse pass's survivor-compaction
    overflow must reach the caller (the engine ladder escalates on it) —
    silent coarse truncation corrupts the fine sample placement."""
    rng = np.random.RandomState(7)
    frame = make_frame(rng)
    # a "distance" volume that keeps EVERYTHING: all samples survive, so
    # any sub-1.0 capacity overflows
    frame = dict(frame)
    frame["pbw"] = frame["pbw"].at[..., 24].set(0.0)
    # big enough that eval_capacity's 512-point floor doesn't hold the
    # full coarse survivor set (64*32 points, cap = 512 < 2048)
    rays = make_ray_batch(rng, 64)
    m = models.AniNeRF(num_train_frames=3, eval_keep_frac=0.05)
    s = RenderSettings(n_samples=32, perturb=False, n_importance=8)
    wpts = jnp.zeros((64, 32, 3))
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0), wpts, rays["ray_d"], jnp.ones((64, 32)),
        frame, train=False,
    ))()
    out = jax.jit(lambda p: render_rays(
        m, p, rays, frame, s, train=False
    ))(params)
    assert "compact_overflow" in out
    assert bool(np.asarray(out["compact_overflow"]).any())


def _carve_setup(rng):
    """One camera + a checkerboard-ish mask that cuts through the test
    scene, so the carve changes the render."""
    K = jnp.asarray([[[100.0, 0, 32], [0, 100, 32], [0, 0, 1]]])
    RT = jnp.asarray([np.concatenate([np.eye(3), [[0], [0], [2.0]]], 1)])
    m = (rng.rand(1, 64, 64) > 0.4).astype(np.float32)
    return K, RT, jnp.asarray(m)


def test_compacted_carve_matches_dense_carve():
    """With inside_fn, compacted eval models carve on the SURVIVOR
    stream (render_rays passes it through); the result must equal the
    dense path's post-hoc raw * vis carve for every family.

    Rays are aimed at vertices with a tight near/far bracket so real
    in-shell survivors exist even at the PDF family's 0.1 threshold —
    in the empty regime the conservative pass-1 and the dense path
    force different argmin points (the documented deviation) and the
    comparison would measure that instead of the carve."""
    rng = np.random.RandomState(5)
    frame = make_frame(rng)
    verts = np.asarray(frame["pvertices"])
    n = 16
    tgt = verts[rng.randint(0, len(verts), n)]
    o = np.tile([[0, 0, -2.0]], (n, 1)).astype(np.float32)
    d = tgt - o
    dist = np.linalg.norm(d, axis=-1, keepdims=True)
    d = (d / dist).astype(np.float32)
    rays = {
        "ray_o": jnp.asarray(o),
        "ray_d": jnp.asarray(d),
        "near": jnp.asarray((dist[:, 0] - 0.3).astype(np.float32)),
        "far": jnp.asarray((dist[:, 0] + 0.3).astype(np.float32)),
        "mask": jnp.ones((n,), bool),
        "occupancy": jnp.asarray(rng.randint(0, 2, n)),
    }
    K, RT, masks = _carve_setup(rng)
    inside_fn = lambda pts: prepare_inside_mask(pts, K, RT, masks)
    s = RenderSettings(n_samples=8, perturb=False)
    wpts = jnp.zeros((16, 8, 3))

    for mk in (
        lambda f: models.AniNeRF(num_train_frames=3, eval_keep_frac=f),
        lambda f: models.AlignedLBW(num_latents=3, norm_th=0.3,
                                    eval_keep_frac=f),
        lambda f: models.NeRFPDF(num_latents=3, eval_keep_frac=f),
        lambda f: models.SDFPDF(num_latents=3, eval_keep_frac=f),
        lambda f: models.NeuSPDF(num_latents=3, eval_keep_frac=f),
    ):
        m_dense, m_comp = mk(0.0), mk(1.0)
        params = jax.jit(lambda m=m_dense: m.init(
            jax.random.PRNGKey(0), wpts, rays["ray_d"], jnp.ones((16, 8)),
            frame, train=False,
        ))()
        out_d = jax.jit(lambda p, m=m_dense: render_rays(
            m, p, rays, frame, s, train=False, inside_fn=inside_fn
        ))(params)
        out_c = jax.jit(lambda p, m=m_comp: render_rays(
            m, p, rays, frame, s, train=False, inside_fn=inside_fn
        ))(params)
        for k in ("rgb_map", "acc_map"):
            # atol 2e-5: the compacted path composites via segmented
            # scans (core/composite.py), a float reassociation of
            # raw2outputs' cumprod (same tolerance as the engine ladder
            # tests)
            np.testing.assert_allclose(
                np.asarray(out_c[k]), np.asarray(out_d[k]),
                rtol=1e-4, atol=2e-5,
                err_msg=f"{type(m_dense).__name__}:{k}",
            )


def test_visibility_carving():
    # one camera looking down -z at the origin; mask on except a zero
    # border: the reference CLAMPS out-of-image projections to the
    # border pixel (tpose_renderer_mmsk.py:41-47), so an off-frustum
    # point reads the border value
    K = jnp.asarray([[[100.0, 0, 32], [0, 100, 32], [0, 0, 1]]])
    RT = jnp.asarray([np.concatenate([np.eye(3), [[0], [0], [2.0]]], 1)])
    m = np.ones((1, 64, 64), np.float32)
    m[:, :, 0] = 0
    m[:, :, -1] = 0
    m[:, 0, :] = 0
    m[:, -1, :] = 0
    masks = jnp.asarray(m)
    pts = jnp.asarray([[0.0, 0, 0], [10.0, 0, 0]])  # center vs off-frustum
    inside = prepare_inside_mask(pts, K, RT, masks)
    assert bool(inside[0]) and not bool(inside[1])


def test_marching_cubes_sphere():
    n = 24
    g = np.linspace(-1, 1, n)
    x, y, z = np.meshgrid(g, g, g, indexing="ij")
    vol = 0.6 - np.sqrt(x**2 + y**2 + z**2)  # inside>0 sphere r=0.6
    sp = 2.0 / (n - 1)
    verts, faces = marching_cubes(vol, 0.0, spacing=(sp, sp, sp), origin=(-1, -1, -1))
    assert len(verts) > 100 and len(faces) > 100
    r = np.linalg.norm(verts, axis=1)
    np.testing.assert_allclose(r.mean(), 0.6, atol=0.02)
    assert faces.max() < len(verts)
    v2, f2 = largest_component(verts, faces)
    assert len(f2) <= len(faces)


def test_density_grid_sweep_pads():
    f = lambda p: jnp.sum(p, axis=-1)
    pts = jnp.asarray(np.random.RandomState(0).randn(1000, 3).astype(np.float32))
    out = density_grid_sweep(f, pts, tile=256)
    np.testing.assert_allclose(np.asarray(out), np.asarray(pts).sum(-1), atol=1e-5)


class TestShardedEval:
    def test_matches_single_device(self):
        """render_image_sharded over the 8-device CPU mesh must produce
        the single-device render exactly (rays are embarrassingly
        parallel)."""
        import jax
        import jax.numpy as jnp
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.models import AniNeRF
        from animatable_nerf_tpu.render import RenderSettings
        from animatable_nerf_tpu.render.renderer import render_image, pad_rays
        from animatable_nerf_tpu.parallel import make_mesh
        from animatable_nerf_tpu.parallel.eval_sharding import (
            render_image_sharded,
        )

        rng = np.random.RandomState(0)
        frame = {
            k: jnp.asarray(v)
            for k, v in ge._synthetic_frame(rng, grid_shape=(8, 8, 8)).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 300).items()}
        settings = RenderSettings(n_samples=8, perturb=False, eval_tile=64)

        model = AniNeRF(num_train_frames=2)
        z = jnp.ones((300, 8))
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )

        mesh = make_mesh(8)
        out_s, n_valid = render_image_sharded(
            model, params, rays, frame, settings, mesh
        )

        padded, _ = pad_rays(rays, n_valid and out_s["rgb_map"].shape[0])
        out_p = jax.jit(
            lambda p, r: render_image(model, p, r, frame, settings)
        )(params, padded)

        assert n_valid == 300
        np.testing.assert_allclose(
            np.asarray(out_s["rgb_map"]), np.asarray(out_p["rgb_map"]),
            rtol=1e-5, atol=1e-6,
        )


class TestPrecomposite:
    def test_matches_dense_composite(self):
        """render_rays with the segment-composited compacted path must
        match the dense raw2outputs path on all maps."""
        import jax
        import jax.numpy as jnp
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.models import AniNeRF
        from animatable_nerf_tpu.render import RenderSettings
        from animatable_nerf_tpu.render.renderer import render_rays

        rng = np.random.RandomState(0)
        frame = {
            k: jnp.asarray(v)
            for k, v in ge._synthetic_frame(rng, grid_shape=(8, 8, 8)).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 64).items()}
        settings = RenderSettings(n_samples=16, perturb=False)
        z = jnp.ones((64, 16))
        m_dense = AniNeRF(num_train_frames=2, eval_keep_frac=0.0)
        m_comp = AniNeRF(num_train_frames=2, eval_keep_frac=1.0)
        params = m_dense.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )
        out_d = jax.jit(
            lambda p: render_rays(m_dense, p, rays, frame, settings,
                                  train=False)
        )(params)
        out_c = jax.jit(
            lambda p: render_rays(m_comp, p, rays, frame, settings,
                                  train=False)
        )(params)
        assert "raw" not in out_c  # precomposited
        for k in ("rgb_map", "acc_map", "depth_map"):
            np.testing.assert_allclose(
                np.asarray(out_c[k]), np.asarray(out_d[k]),
                rtol=1e-4, atol=1e-5,
            )

    def test_slab_prefilter_matches_dense_through_renderer(self):
        """The production eval path (slab_filter, as make_model builds
        it) must match the dense render through render_rays — the
        renderer guarantees the wpts = ray_o + viewdir * z invariant
        the slab pre-filter requires."""
        import jax
        import jax.numpy as jnp
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.models import AniNeRF
        from animatable_nerf_tpu.render import RenderSettings
        from animatable_nerf_tpu.render.renderer import render_rays

        rng = np.random.RandomState(0)
        frame = {
            k: jnp.asarray(v)
            for k, v in ge._synthetic_frame(rng, grid_shape=(8, 8, 8)).items()
        }
        rays = {
            k: jnp.asarray(v)
            for k, v in ge._rays(
                rng, 64, bounds=np.asarray(frame["pbounds"])
            ).items()
        }
        settings = RenderSettings(n_samples=16, perturb=False)
        z = jnp.ones((64, 16))
        m_dense = AniNeRF(num_train_frames=2, eval_keep_frac=0.0)
        m_slab = AniNeRF(num_train_frames=2, eval_keep_frac=1.0,
                         slab_filter=8)
        params = m_dense.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )
        out_d = jax.jit(
            lambda p: render_rays(m_dense, p, rays, frame, settings,
                                  train=False)
        )(params)
        out_s = jax.jit(
            lambda p: render_rays(m_slab, p, rays, frame, settings,
                                  train=False)
        )(params)
        assert not bool(np.asarray(out_s["compact_overflow"]).any())
        for k in ("rgb_map", "acc_map", "depth_map"):
            np.testing.assert_allclose(
                np.asarray(out_s[k]), np.asarray(out_d[k]),
                rtol=1e-4, atol=1e-5,
            )


class TestImportanceSampling:
    def test_hierarchical_render(self):
        """n_importance adds inverse-CDF fine samples; output maps stay
        finite and the deterministic path is reproducible."""
        import jax
        import jax.numpy as jnp
        import sys, os

        sys.path.insert(0, os.path.dirname(os.path.dirname(__file__)))
        import __graft_entry__ as ge
        from animatable_nerf_tpu.models import AniNeRF
        from animatable_nerf_tpu.render import RenderSettings
        from animatable_nerf_tpu.render.renderer import render_rays

        rng = np.random.RandomState(0)
        frame = {
            k: jnp.asarray(v)
            for k, v in ge._synthetic_frame(rng, grid_shape=(8, 8, 8)).items()
        }
        rays = {k: jnp.asarray(v) for k, v in ge._rays(rng, 32).items()}
        settings = RenderSettings(
            n_samples=8, perturb=False, n_importance=8
        )
        model = AniNeRF(num_train_frames=2)
        z = jnp.ones((32, 8))
        params = model.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )
        f = jax.jit(
            lambda p: render_rays(model, p, rays, frame, settings,
                                  train=False)
        )
        out = f(params)
        assert out["z_vals"].shape == (32, 16)  # coarse + fine, sorted
        zs = np.asarray(out["z_vals"])
        assert (np.diff(zs, axis=-1) >= 0).all()
        assert np.isfinite(np.asarray(out["rgb_map"])).all()
        out2 = f(params)
        np.testing.assert_allclose(
            np.asarray(out["rgb_map"]), np.asarray(out2["rgb_map"])
        )

        # training path with gradients through the two-pass render
        settings_t = RenderSettings(
            n_samples=8, perturb=True, n_importance=4
        )

        def loss(p):
            o = render_rays(
                model, p, rays, frame, settings_t,
                key=jax.random.PRNGKey(3), train=True,
            )
            return jnp.mean(o["rgb_map"] ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)


def test_composite_compacted_matches_raw2outputs():
    """Segmented-scan compositing on a compacted stream == dense
    raw2outputs on the scattered-back raw, with and without the
    ray_counts hint, including capacity truncation."""
    import jax
    import jax.numpy as jnp

    from animatable_nerf_tpu.core.composite import (
        composite_compacted, raw2outputs,
    )
    from animatable_nerf_tpu.models.common import (
        compact_payload, scatter_compacted_raw,
    )

    rng = np.random.RandomState(7)
    R, S = 40, 16
    N = R * S
    keep = rng.rand(N) < 0.3
    keep[:S] = False  # one ray with zero survivors
    rgb = rng.rand(N, 3).astype(np.float32)
    alpha = rng.rand(N).astype(np.float32)
    z = np.sort(rng.rand(R, S).astype(np.float32), axis=-1).reshape(-1)

    for cap in (512, 128):  # 128 < kept count: truncation
        sidx, sv, (c_rgb, c_alpha, c_z), n, ovf = compact_payload(
            jnp.asarray(keep),
            [jnp.asarray(rgb), jnp.asarray(alpha), jnp.asarray(z)], cap,
        )
        c_alpha = jnp.where(sv, c_alpha, 0.0)
        counts = jnp.asarray(keep.reshape(R, S).sum(-1), jnp.int32)
        maps_counts = composite_compacted(
            sidx, sv, c_rgb, c_alpha, c_z, R, S, ray_counts=counts
        )
        maps_search = composite_compacted(
            sidx, sv, c_rgb, c_alpha, c_z, R, S
        )
        # dense oracle: scatter raw back (alpha zeroed off-survivors),
        # composite with raw2outputs
        raw_c = jnp.concatenate([c_rgb, c_alpha[:, None]], axis=-1)
        raw = scatter_compacted_raw(raw_c, sv, sidx, n, R, S)
        dm = raw2outputs(raw, jnp.asarray(z.reshape(R, S)), False)
        dense = (dm[0], dm[2], dm[4])  # rgb, acc, depth
        for a, b, name in zip(maps_counts, dense,
                              ("rgb", "acc", "depth")):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6,
                err_msg=f"counts {name} cap={cap}",
            )
        for a, b in zip(maps_counts, maps_search):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-7
            )


def test_vertex_normals_unit_cube_face():
    """Area-weighted vertex normals: a flat square's normals all equal
    the face normal; degenerate (empty) meshes return zeros."""
    import numpy as np
    from animatable_nerf_tpu.render.mesh import vertex_normals

    verts = np.array(
        [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
    )
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int64)
    n = vertex_normals(verts, faces)
    np.testing.assert_allclose(n, [[0, 0, 1]] * 4, atol=1e-6)
    empty = vertex_normals(verts, np.zeros((0, 3), np.int64))
    assert empty.shape == (4, 3) and (empty == 0).all()


@pytest.mark.parametrize(
    "name", ["aninerf", "aligned_lbw", "nerf_pdf", "sdf_pdf", "neus_pdf"]
)
def test_dense_chunked_model_apply_matches_flat(name):
    """RenderSettings.dense_chunk_rows (the TPU trunk-miscompile guard,
    tools/check_tpu_trunk_numerics.py): ray-chunked dense model
    application must reproduce the flat dense call exactly — including a
    non-divisible ray count (pad rays parked far from the scene)."""
    rng = np.random.RandomState(3)
    frame = make_frame(rng)
    # tight vertex cluster: the pdf families filter on the IDW-WEIGHTED
    # 5-NN distance (< 0.1), which a sparse random cloud fails even at a
    # vertex — and a ray with no true in-shell point exposes the one
    # documented semantic difference of the chunked path (the argmin
    # forcing acts per chunk)
    tight = jnp.asarray(np.asarray(frame["pvertices"]) * 0.15)
    frame = dict(frame, pvertices=tight, tvertices=tight)
    n_rays, n_samples = 22, 8  # 22 rays / chunk 5 -> 5 chunks, pad 3
    rays = make_ray_batch(rng, n_rays)
    # aim every ray THROUGH a vertex so each chunk holds in-shell samples
    verts = np.asarray(frame["pvertices"])
    targets = verts[rng.randint(0, len(verts), n_rays)]
    o = np.asarray(rays["ray_o"])
    d = targets - o
    dist = np.linalg.norm(d, axis=-1, keepdims=True)
    rays["ray_d"] = jnp.asarray((d / dist).astype(np.float32))
    rays["near"] = jnp.asarray((dist[:, 0] - 0.3).astype(np.float32))
    rays["far"] = jnp.asarray((dist[:, 0] + 0.3).astype(np.float32))
    cls = models.MODELS[name]
    if name == "aninerf":
        m = cls(num_train_frames=2, norm_th=0.5, eval_keep_frac=0.0)
    elif name == "aligned_lbw":
        m = cls(num_latents=2, norm_th=0.5, eval_keep_frac=0.0)
    else:
        m = cls(num_latents=2, eval_keep_frac=0.0)
    wpts = jnp.zeros((n_rays, n_samples, 3))
    params = m.init(
        jax.random.PRNGKey(0), wpts, rays["ray_d"],
        jnp.ones((n_rays, n_samples)), frame, train=False,
    )

    flat = RenderSettings(n_samples=n_samples, perturb=False,
                          dense_chunk_rows=0)
    chunked = RenderSettings(n_samples=n_samples, perturb=False,
                             dense_chunk_rows=5 * n_samples)
    out_f = jax.jit(lambda p: render_rays(m, p, rays, frame, flat,
                                          train=False))(params)
    out_c = jax.jit(lambda p: render_rays(m, p, rays, frame, chunked,
                                          train=False))(params)
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out_f[k]), np.asarray(out_c[k]), atol=1e-5,
            err_msg=f"{name}:{k}",
        )


def test_stage2_compaction_exact_and_overflow():
    """The eval stage-2 compaction (models/pdf.py _eval_compacted:
    trunks re-compacted to the exact-survivor capacity after the exact
    weighted filter) must be bit-identical to the single-compaction
    path at a scale where the stage-2 capacity REALLY shrinks, and a
    too-small stage-2 ratio must raise compact_overflow instead of
    silently dropping survivors."""
    rng = np.random.RandomState(9)
    frame = make_frame(rng)
    verts = np.asarray(frame["pvertices"])
    n = 2048  # 2048 rays x 8 samples: exact survivors >> the 512-pt cap floor
    tgt = verts[rng.randint(0, len(verts), n)]
    o = np.tile([[0, 0, -2.0]], (n, 1)).astype(np.float32)
    d = tgt - o
    dist = np.linalg.norm(d, axis=-1, keepdims=True)
    d = (d / dist).astype(np.float32)
    rays = {
        "ray_o": jnp.asarray(o),
        "ray_d": jnp.asarray(d),
        "near": jnp.asarray((dist[:, 0] - 0.3).astype(np.float32)),
        "far": jnp.asarray((dist[:, 0] + 0.3).astype(np.float32)),
        "mask": jnp.ones((n,), bool),
        "occupancy": jnp.asarray(rng.randint(0, 2, n)),
    }
    s = RenderSettings(n_samples=8, perturb=False)
    wpts = jnp.zeros((n, 8, 3))

    # true exact-weighted survivor count on the deterministic sample
    # grid (stratified_z_vals, perturb=False; R=I/Th=0 in make_frame) —
    # used to pick stage-2 ratios that provably fit / provably overflow
    from animatable_nerf_tpu.core import sample_blend_closest_points
    from animatable_nerf_tpu.core.sampling import stratified_z_vals, z_vals_to_pts

    z = stratified_z_vals(rays["near"], rays["far"], 8)
    pts_flat = np.asarray(
        z_vals_to_pts(rays["ray_o"], rays["ray_d"], z)
    ).reshape(-1, 3)
    _, pn = sample_blend_closest_points(
        jnp.asarray(pts_flat), frame["pvertices"], frame["weights"]
    )
    n_exact = int((np.asarray(pn)[..., 0] < 0.1).sum())
    n_pts = n * 8
    assert n_exact > 700, f"test scene too sparse ({n_exact} survivors)"
    ratio_fit = min((((n_exact * 3) // 2) // 512 + 1) * 512 / n_pts, 1.0)
    ratio_ovf = max((n_exact // 2) // 512, 1) * 512 / n_pts

    for cls in (models.NeRFPDF, models.SDFPDF, models.NeuSPDF):
        m0 = cls(num_latents=3, eval_keep_frac=1.0, stage2_ratio=0.0)
        params = jax.jit(
            lambda m0=m0: m0.init(
                jax.random.PRNGKey(0), wpts, rays["ray_d"],
                jnp.ones((n, 8)), frame, train=False,
            )
        )()
        out0 = jax.jit(
            lambda p, m0=m0: render_rays(m0, p, rays, frame, s, train=False)
        )(params)
        # ratio 0.5 halves the trunk capacity; survivors must still fit
        m2 = cls(num_latents=3, eval_keep_frac=1.0, stage2_ratio=ratio_fit)
        out2 = jax.jit(
            lambda p, m2=m2: render_rays(m2, p, rays, frame, s, train=False)
        )(params)
        assert not bool(np.asarray(out2["compact_overflow"]).any()), cls
        # tolerance: removing a dead slot also removes its
        # (1 - 0 + 1e-10) transmittance factor from the segmented scan
        # (core/composite.py composite_compacted docstring) — a ~1e-7
        # relative epsilon artifact, not a math difference
        np.testing.assert_allclose(
            np.asarray(out0["rgb_map"]), np.asarray(out2["rgb_map"]),
            rtol=1e-6, atol=1e-8, err_msg=f"{cls.__name__} stage-2 rgb",
        )
        np.testing.assert_allclose(
            np.asarray(out0["acc_map"]), np.asarray(out2["acc_map"]),
            rtol=1e-6, atol=1e-8,
        )
        # a ratio far below the real survivor fraction must overflow
        m_tiny = cls(num_latents=3, eval_keep_frac=1.0, stage2_ratio=ratio_ovf)
        out_t = jax.jit(
            lambda p, m_tiny=m_tiny: render_rays(
                m_tiny, p, rays, frame, s, train=False
            )
        )(params)
        assert bool(np.asarray(out_t["compact_overflow"]).any()), (
            f"{cls.__name__}: expected stage-2 overflow to surface"
        )


def test_neus_stream_alpha_matches_dense(data_whole=None):
    """NeuS on-stream CDF alpha (r4, VERDICT-r3 item 5) == the dense
    scatter-back oracle, on a scene with real survivors (a vacuous
    all-filtered comparison would pass trivially — the assert guards
    against that)."""
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    fr = ge._synthetic_frame(rng, grid_shape=(8, 8, 8))
    frame = {k: jnp.asarray(v) for k, v in fr.items()}
    n, S = 64, 16
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, n, bounds=fr["pbounds"]).items()
    }
    s = RenderSettings(n_samples=S, perturb=False)
    m_dense = models.NeuSPDF(num_latents=3, eval_keep_frac=0.0)
    m_comp = models.NeuSPDF(num_latents=3, eval_keep_frac=1.0)
    params = jax.jit(
        lambda: m_dense.init(
            jax.random.PRNGKey(0), jnp.zeros((n, S, 3)), rays["ray_d"],
            jnp.ones((n, S)), frame, train=False,
        )
    )()
    out_d = jax.jit(
        lambda p: render_rays(m_dense, p, rays, frame, s, train=False)
    )(params)
    out_c = jax.jit(
        lambda p: render_rays(m_comp, p, rays, frame, s, train=False)
    )(params)
    assert float(np.asarray(out_d["acc_map"]).sum()) > 1.0, (
        "test scene produced no opacity — comparison would be vacuous"
    )
    for k in ("rgb_map", "acc_map", "depth_map"):
        np.testing.assert_allclose(
            np.asarray(out_c[k]), np.asarray(out_d[k]),
            rtol=1e-5, atol=1e-6, err_msg=k,
        )
