"""Smoke + invariant tests for all model families on synthetic frames."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from animatable_nerf_tpu import models
from animatable_nerf_tpu.core import rigid_transforms, big_pose_A

R_RAYS, S = 6, 8
N_VERTS = 80


def make_frame(rng, grid=True):
    parents = np.array(
        [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17, 18,
         19, 20, 21]
    )
    joints = (rng.randn(24, 3) * 0.2).astype(np.float32)
    poses = (rng.randn(24, 3) * 0.1).astype(np.float32)
    A = rigid_transforms(poses, joints, parents)
    big_A = big_pose_A(jnp.asarray(joints), parents)
    verts = (rng.randn(N_VERTS, 3) * 0.3).astype(np.float32)
    w = rng.rand(N_VERTS, 24).astype(np.float32)
    w = w / w.sum(-1, keepdims=True)
    frame = {
        "R": jnp.eye(3),
        "Th": jnp.zeros((1, 3)),
        "A": A,
        "big_A": big_A,
        "poses": jnp.asarray(poses.reshape(-1)),
        "weights": jnp.asarray(w),
        "pvertices": jnp.asarray(verts),
        "tvertices": jnp.asarray(verts),
        "tbounds": jnp.asarray(
            np.stack([verts.min(0) - 0.1, verts.max(0) + 0.1])
        ),
        "latent_index": jnp.asarray(0, jnp.int32),
        "bw_latent_index": jnp.asarray(0, jnp.int32),
    }
    if grid:
        frame["pbw"] = jnp.asarray(rng.rand(8, 8, 8, 25).astype(np.float32))
        frame["pbounds"] = frame["tbounds"]
        frame["tbw"] = jnp.asarray(rng.rand(8, 8, 8, 25).astype(np.float32))
    return frame


def make_rays(rng):
    wpts = (rng.randn(R_RAYS, S, 3) * 0.3).astype(np.float32)
    viewdir = rng.randn(R_RAYS, 3).astype(np.float32)
    viewdir = viewdir / np.linalg.norm(viewdir, axis=-1, keepdims=True)
    z_vals = np.sort(rng.rand(R_RAYS, S).astype(np.float32) + 1.0, axis=-1)
    return jnp.asarray(wpts), jnp.asarray(viewdir), jnp.asarray(z_vals)


@pytest.fixture(scope="module")
def data():
    rng = np.random.RandomState(3)
    return make_frame(rng), make_rays(rng)


def _init_and_run(model, data, train=True):
    # jit everything: compiles route through a slow remote relay in this
    # environment, and jitted programs hit the persistent cache
    frame, (wpts, vd, z) = data
    params = jax.jit(
        lambda: model.init(jax.random.PRNGKey(0), wpts, vd, z, frame, train=train)
    )()
    out = jax.jit(
        lambda p: model.apply(p, wpts, vd, z, frame, train=train)
    )(params)
    return params, out


def test_aninerf_shapes_and_masking(data):
    m = models.AniNeRF(num_train_frames=3)
    params, out = _init_and_run(m, data)
    assert out["raw"].shape == (R_RAYS, S, 4)
    assert bool(jnp.isfinite(out["raw"]).all())
    assert out["pbw"].shape == (R_RAYS * S, 24)
    assert out["tbw"].shape == (R_RAYS * S, 24)
    assert out["bw_mask"].dtype == bool
    # blend weights are distributions
    np.testing.assert_allclose(np.asarray(out["pbw"].sum(-1)), 1.0, atol=1e-4)


def test_aninerf_filtered_points_zero(data):
    """Points whose distance channel exceeds norm_th must contribute raw==0
    (masked-compute parity with the reference's compaction)."""
    frame, (wpts, vd, z) = data
    # distance channel = 1 everywhere -> all filtered except forced argmin
    far_frame = dict(frame)
    far_frame["pbw"] = frame["pbw"].at[..., 24].set(1.0)
    m = models.AniNeRF(num_train_frames=3)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), wpts, vd, z, far_frame))()
    out = jax.jit(lambda p: m.apply(p, wpts, vd, z, far_frame))(params)
    raw = np.asarray(out["raw"]).reshape(-1, 4)
    nonzero_rows = (np.abs(raw).sum(-1) > 0).sum()
    assert nonzero_rows <= 1  # only the forced argmin point may survive


def test_aninerf_grad_flows(data):
    frame, (wpts, vd, z) = data
    m = models.AniNeRF(num_train_frames=3)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), wpts, vd, z, frame))()

    def loss(p):
        out = m.apply(p, wpts, vd, z, frame)
        return jnp.mean(out["raw"] ** 2)

    g = jax.jit(jax.grad(loss))(params)
    total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert float(total) > 0


def test_aninerf_novel_pose_field(data):
    frame, (wpts, vd, z) = data
    m = models.AniNeRF(num_train_frames=3, num_eval_frames=2)
    params = jax.jit(lambda: m.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=False, novel_pose=True
    ))()
    assert "novel_pose_bw" in params["params"]
    out = jax.jit(lambda p: m.apply(
        p, wpts, vd, z, frame, train=False, novel_pose=True))(params)
    assert bool(jnp.isfinite(out["raw"]).all())


def test_nerf_pdf(data):
    m = models.NeRFPDF(num_latents=3)
    params, out = _init_and_run(m, data)
    assert out["raw"].shape == (R_RAYS, S, 4)
    assert out["resd"].shape == (R_RAYS * S, 3)
    assert float(jnp.abs(out["resd"]).max()) <= 0.05
    assert bool(jnp.isfinite(out["raw"]).all())


def test_sdf_pdf_full_outputs(data):
    m = models.SDFPDF(num_latents=3)
    params, out = _init_and_run(m, data)
    assert out["raw"].shape == (R_RAYS, S, 4)
    assert out["sdf"].shape == (R_RAYS, S)
    assert out["gradients"].shape == (R_RAYS * S, 3)
    assert out["observed_gradients"].shape == (R_RAYS * S, 3)
    assert bool(jnp.isfinite(out["raw"]).all())
    # normals are finite and non-degenerate where valid
    gnorm = np.asarray(jnp.linalg.norm(out["gradients"], axis=-1))
    mask = np.asarray(out["grad_mask"])
    if mask.any():
        assert np.isfinite(gnorm[mask]).all() and (gnorm[mask] > 1e-3).all()


def test_sdf_pdf_eikonal_double_grad(data):
    """grad-of-grad (eikonal loss through jax.grad normals) must work."""
    frame, (wpts, vd, z) = data
    m = models.SDFPDF(num_latents=3)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), wpts, vd, z, frame))()

    def loss(p):
        out = m.apply(p, wpts, vd, z, frame)
        g = out["gradients"]
        eik = (jnp.linalg.norm(g, axis=-1) - 1.0) ** 2
        return jnp.mean(eik) + jnp.mean(out["raw"] ** 2)

    g = jax.jit(jax.grad(loss))(params)
    total = jax.tree_util.tree_reduce(lambda a, b: a + jnp.sum(jnp.abs(b)), g, 0.0)
    assert bool(jnp.isfinite(total)) and float(total) > 0


def test_neus_pdf(data):
    m = models.NeuSPDF(num_latents=3)
    params, out = _init_and_run(m, data)
    assert out["raw"].shape == (R_RAYS, S, 4)
    alpha = np.asarray(out["raw"][..., 3])
    assert (alpha >= 0).all() and (alpha <= 1).all()


@pytest.mark.parametrize(
    "cls", [models.AlignedLBW, models.AlignedPBW, models.AlignedSMPL,
            models.AlignedLBWPDF]
)
def test_aligned_variants(cls, data):
    m = cls(num_latents=3)
    params, out = _init_and_run(m, data)
    assert out["raw"].shape == (R_RAYS, S, 4)
    assert bool(jnp.isfinite(out["raw"]).all())
    if cls is not models.AlignedSMPL:
        assert out["pbw"].shape == (R_RAYS * S, 24)
    if cls is models.AlignedLBWPDF:
        assert out["resd"].shape == (R_RAYS * S, 3)


def test_density_paths(data):
    """Mesh-extraction density/sdf entry points."""
    frame, (wpts, vd, z) = data
    pts = wpts.reshape(-1, 3)

    m = models.AniNeRF(num_train_frames=3)
    params = jax.jit(lambda: m.init(jax.random.PRNGKey(0), wpts, vd, z, frame))()
    d = jax.jit(lambda p: m.apply(p, pts, frame, method=m.density))(params)
    assert d.shape == (R_RAYS * S,)

    m2 = models.SDFPDF(num_latents=3)
    params2 = jax.jit(lambda: m2.init(jax.random.PRNGKey(0), wpts, vd, z, frame))()
    s = jax.jit(lambda p: m2.apply(p, pts, frame, method=m2.sdf))(params2)
    assert s.shape == (R_RAYS * S,)


def test_eval_compaction_matches_full_path(data):
    """The compacted eval render must equal the masked full path exactly
    while survivors fit the capacity (models/common.py compact_indices)."""
    frame, (wpts, vd, z) = data
    m_full = models.AniNeRF(num_train_frames=3, eval_keep_frac=0.0)
    m_comp = models.AniNeRF(num_train_frames=3, eval_keep_frac=1.0)
    params = m_full.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=False
    )
    out_full = jax.jit(
        lambda p: m_full.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    out_comp = jax.jit(
        lambda p: m_comp.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    np.testing.assert_allclose(
        np.asarray(out_comp["raw"]), np.asarray(out_full["raw"]),
        rtol=1e-6, atol=1e-6,
    )


def test_compact_indices():
    from animatable_nerf_tpu.models.common import compact_indices

    keep = jnp.asarray(
        np.array([0, 1, 1, 0, 1, 0, 0, 1], dtype=bool)
    )
    idx, n = compact_indices(keep, 8)
    assert int(n) == 4
    assert np.asarray(idx[:4]).tolist() == [1, 2, 4, 7]
    # overflow drops the latest survivors
    idx2, n2 = compact_indices(keep, 2)
    assert int(n2) == 2
    assert np.asarray(idx2).tolist() == [1, 2]


def test_compact_indices_hier_bit_equal():
    """The sort-free hierarchical rank search must match the production
    argsort formulation on every VALID slot (j < n_kept) across sizes
    (incl. non-multiple-of-512 n), keep fractions, and overflow
    (CLAUDE.md round-4 note; measured slower at whole-frame scale, kept
    as the documented negative + tile-scale alternative)."""
    from animatable_nerf_tpu.models.common import (
        _compact_indices_hier,
        _compact_indices_sort,
    )

    rng = np.random.RandomState(3)
    for n in (31, 512, 700, 4096, 5000):
        for frac in (0.0, 0.03, 0.3, 1.0):
            keep = jnp.asarray(rng.rand(n) < frac)
            for capacity in (16, 256, n):
                ih, nh = jax.jit(
                    _compact_indices_hier, static_argnums=1
                )(keep, capacity)
                is_, ns = jax.jit(
                    _compact_indices_sort, static_argnums=1
                )(keep, capacity)
                assert int(nh) == int(ns), (n, frac, capacity)
                v = int(nh)
                np.testing.assert_array_equal(
                    np.asarray(ih[:v]), np.asarray(is_[:v]),
                    err_msg=f"n={n} frac={frac} cap={capacity}",
                )


def test_aligned_stage2_animation(data):
    """Sample-based stage-2 consistency pair for the KNN family
    (aninerf_sample_animation_trainer.py semantics)."""
    frame, (wpts, vd, z) = data
    m = models.AlignedLBW(num_latents=3, num_eval_frames=2)
    params = m.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=True,
        novel_pose=True,
    )
    ppts = jnp.asarray(
        np.random.RandomState(1).randn(32, 3).astype(np.float32) * 0.2
    )
    pbw0, tbw0, sel0 = m.apply(
        params, ppts, frame, method=m.animation_from_pose
    )
    pbw1, tbw1, sel1 = m.apply(
        params, ppts, frame, method=m.animation_from_canonical
    )
    for t in (pbw0, tbw0, pbw1, tbw1):
        assert t.shape == (32, 24)
        np.testing.assert_allclose(np.asarray(t.sum(-1)), 1.0, atol=1e-4)
    assert sel0.dtype == bool and sel1.dtype == bool
    assert bool(sel0.any()) and bool(sel1.any())  # forced argmax


@pytest.mark.parametrize(
    "cls", [models.NeRFPDF, models.SDFPDF, models.NeuSPDF]
)
def test_pdf_bf16_compute_dtype_variant(cls, data):
    """The bf16 eval fast-variant (dtype=bfloat16 on the resd/sdf/color
    trunks; bench.py's quality-guarded SDF fast path): identical param
    trees (compute-only knob), output within bf16 tolerance of f32, and
    finite grads through the bf16 trunks (normals/eikonal are jax.grad
    THROUGH the cast)."""
    frame, (wpts, vd, z) = data
    m32 = cls(num_latents=3)
    m16 = cls(num_latents=3, dtype=jnp.bfloat16)
    p32 = jax.jit(
        lambda: m32.init(jax.random.PRNGKey(0), wpts, vd, z, frame,
                         train=False)
    )()
    p16 = jax.jit(
        lambda: m16.init(jax.random.PRNGKey(0), wpts, vd, z, frame,
                         train=False)
    )()
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_array_equal(
            np.asarray(a), np.asarray(b)
        ),
        p32, p16,
    )
    o32 = jax.jit(
        lambda p: m32.apply(p, wpts, vd, z, frame, train=False)
    )(p32)
    o16 = jax.jit(
        lambda p: m16.apply(p, wpts, vd, z, frame, train=False)
    )(p32)
    r32, r16 = np.asarray(o32["raw"]), np.asarray(o16["raw"])
    assert np.isfinite(r16).all()
    # rgb channels are sigmoid-bounded; bf16 keeps them within ~1e-2
    np.testing.assert_allclose(r16[..., :3], r32[..., :3], atol=2e-2)

    def loss(p):
        out = m16.apply(p, wpts, vd, z, frame, train=True)
        return jnp.mean(out["raw"] ** 2) + jnp.mean(out["resd"] ** 2)

    g = jax.jit(jax.grad(loss))(p32)
    assert all(
        bool(jnp.isfinite(l).all()) for l in jax.tree_util.tree_leaves(g)
    )


@pytest.mark.parametrize(
    "cls", [models.NeRFPDF, models.SDFPDF, models.NeuSPDF]
)
def test_pdf_eval_compaction_matches_full_path(cls, data):
    """Compacted eval == masked full path for the PDF/SDF/NeuS family
    (NeuS compacts the MLP work and scatters sdf back densely for the
    per-ray CDF alpha)."""
    frame, (wpts, vd, z) = data
    m_full = cls(num_latents=3, eval_keep_frac=0.0)
    m_comp = cls(num_latents=3, eval_keep_frac=1.0)
    params = m_full.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=False
    )
    out_full = jax.jit(
        lambda p: m_full.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    out_comp = jax.jit(
        lambda p: m_comp.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    np.testing.assert_allclose(
        np.asarray(out_comp["raw"]), np.asarray(out_full["raw"]),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize(
    "cls", [models.NeRFPDF, models.SDFPDF, models.NeuSPDF,
            models.AlignedLBW]
)
def test_eval_compaction_grid_pass1_matches_full_path(cls, data):
    """With the per-frame packed distance grid attached (the engine's
    knn_grid_res fast path), pass 1 keeps a certified superset and the
    exact filter is re-applied on the compacted stream — the eval output
    must equal the dense masked path bit-for-bit at test tolerance."""
    import functools
    from animatable_nerf_tpu.ops.knn_pallas import build_pdist_payload

    frame, (wpts, vd, z) = data
    packed, margin, bounds = jax.jit(
        functools.partial(build_pdist_payload, res=12)
    )(frame["pvertices"])
    gframe = {**frame, "pdist_packed": packed, "pdist_margin": margin,
              "pdist_bounds": bounds}
    kw = {} if cls is not models.AlignedLBW else {"norm_th": 0.3}
    m_full = cls(num_latents=3, eval_keep_frac=0.0, **kw)
    m_comp = cls(num_latents=3, eval_keep_frac=1.0, **kw)
    params = m_full.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=False
    )
    out_full = jax.jit(
        lambda p: m_full.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    out_comp = jax.jit(
        lambda p: m_comp.apply(p, wpts, vd, z, gframe, train=False)
    )(params)
    np.testing.assert_allclose(
        np.asarray(out_comp["raw"]), np.asarray(out_full["raw"]),
        rtol=1e-5, atol=1e-6,
    )


@pytest.mark.parametrize(
    "cls", [models.AlignedLBW, models.AlignedSMPL, models.AlignedPBW]
)
def test_aligned_eval_compaction_matches_full_path(cls, data):
    """norm_th 0.3 puts real survivors in the tiny test scene — the
    regime the models run in (a body IS in frame). With ZERO in-shell
    points the conservative min-distance pass 1 and the dense path
    force different (equally out-of-shell) single argmin points — the
    documented empty-frame deviation (models/pdf.py _compact_inputs);
    see test_aligned_empty_scene_compaction for that case."""
    frame, (wpts, vd, z) = data
    m_full = cls(num_latents=3, eval_keep_frac=0.0, norm_th=0.3)
    m_comp = cls(num_latents=3, eval_keep_frac=1.0, norm_th=0.3)
    params = m_full.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=False
    )
    out_full = jax.jit(
        lambda p: m_full.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    out_comp = jax.jit(
        lambda p: m_comp.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    np.testing.assert_allclose(
        np.asarray(out_comp["raw"]), np.asarray(out_full["raw"]),
        rtol=1e-5, atol=1e-6,
    )


def test_eval_hier_segment_prefilter_matches_full_path(data, rng):
    """The hierarchical segment pre-filter (seg_filter opt-in) must
    equal the masked full path: the certified Lipschitz margin makes
    the candidate set a superset of the exact survivors and pass 2
    re-applies the exact filter. Exercised both on the noise volume
    (Lipschitz bound huge -> keeps everything -> trivially exact) and
    on a true distance field (selective pre-filter). wpts must satisfy
    the renderer's invariant wpts = ray_o + viewdir * z (the hier path
    recomputes candidate points from the rays instead of materializing
    the dense point set)."""
    frame, (_, vd, z) = data
    ray_o = jnp.asarray(rng.randn(vd.shape[0], 3).astype(np.float32) * 0.1)
    wpts = ray_o[:, None, :] + vd[:, None, :] * z[..., None]
    # realistic distance channel: true distance to the vertex cloud
    verts = np.asarray(frame["pvertices"])
    b = np.asarray(frame["pbounds"])
    axes = [np.linspace(b[0][i], b[1][i], 16) for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    d = np.sqrt(
        ((g[:, None, :] - verts[None]) ** 2).sum(-1).min(-1)
    ).reshape(16, 16, 16)
    pbw = np.concatenate(
        [rng.rand(16, 16, 16, 24).astype(np.float32), d[..., None]], -1
    ).astype(np.float32)
    frame = dict(frame)
    frame["pbw"] = jnp.asarray(pbw)

    m_full = models.AniNeRF(num_train_frames=3, eval_keep_frac=0.0,
                            norm_th=0.2)
    m_hier = models.AniNeRF(num_train_frames=3, eval_keep_frac=0.5,
                            norm_th=0.2, seg_filter=4)
    params = m_full.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=False
    )
    out_full = jax.jit(
        lambda p: m_full.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    out_hier = jax.jit(
        lambda p: m_hier.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    assert not bool(np.asarray(out_hier["compact_overflow"]).any())
    np.testing.assert_allclose(
        np.asarray(out_hier["raw"]), np.asarray(out_full["raw"]),
        rtol=1e-5, atol=1e-5,
    )


def test_eval_slab_prefilter_matches_full_path(data, rng):
    """The slab segment pre-filter (slab_filter, the production eval
    fast path) must equal the masked full path: occupied-supercell
    boxes are exact-conservative (trilerp is multilinear, so a cell can
    contain an in-shell point only if a corner is in-shell), the slab
    span covers every in-box sample, and pass 2 re-applies the exact
    f32 filter. wpts must satisfy the renderer invariant
    wpts = ray_o + viewdir * z."""
    frame, (_, vd, _) = data
    rngs = np.random.RandomState(11)
    ray_o = jnp.asarray(rngs.randn(vd.shape[0], 3).astype(np.float32) * 0.1)
    # the slab path's analytic_z contract: z is the affine stratified
    # eval grid and wpts lies on the rays (render_rays guarantees both)
    from animatable_nerf_tpu.core.sampling import stratified_z_vals

    near = jnp.asarray(rngs.rand(vd.shape[0]).astype(np.float32) + 0.5)
    far = near + jnp.asarray(rngs.rand(vd.shape[0]).astype(np.float32) + 0.5)
    z = stratified_z_vals(near, far, S, key=None, perturb=False)
    wpts = ray_o[:, None, :] + vd[:, None, :] * z[..., None]
    verts = np.asarray(frame["pvertices"])
    b = np.asarray(frame["pbounds"])
    axes = [np.linspace(b[0][i], b[1][i], 16) for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    d = np.sqrt(
        ((g[:, None, :] - verts[None]) ** 2).sum(-1).min(-1)
    ).reshape(16, 16, 16)
    pbw = np.concatenate(
        [rng.rand(16, 16, 16, 24).astype(np.float32), d[..., None]], -1
    ).astype(np.float32)
    frame = dict(frame)
    frame["pbw"] = jnp.asarray(pbw)

    m_full = models.AniNeRF(num_train_frames=3, eval_keep_frac=0.0,
                            norm_th=0.2)
    params = m_full.init(
        jax.random.PRNGKey(0), wpts, vd, z, frame, train=False
    )
    out_full = jax.jit(
        lambda p: m_full.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    for supercell in (1, 2):
        m_slab = models.AniNeRF(
            num_train_frames=3, eval_keep_frac=0.5, norm_th=0.2,
            slab_filter=4, slab_supercell=supercell,
        )
        out_slab = jax.jit(
            lambda p: m_slab.apply(p, wpts, vd, z, frame, train=False,
                                   analytic_z=True)
        )(params)
        assert not bool(np.asarray(out_slab["compact_overflow"]).any())
        np.testing.assert_allclose(
            np.asarray(out_slab["raw"]), np.asarray(out_full["raw"]),
            rtol=1e-5, atol=1e-5,
        )
        # the pre-filter must actually FILTER (conservative != keep-all:
        # the dead-slot infinite-box failure mode keeps every segment)
        n_pts = int(np.prod(z.shape))
        assert int(np.asarray(out_slab["compact_count"])[0]) < n_pts
    # without the analytic_z promise the slab path must NOT engage
    # (arbitrary z/wpts callers fall back to the flat compacted path)
    m_slab = models.AniNeRF(num_train_frames=3, eval_keep_frac=0.5,
                            norm_th=0.2, slab_filter=4)
    out_flat = jax.jit(
        lambda p: m_slab.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    np.testing.assert_allclose(
        np.asarray(out_flat["raw"]), np.asarray(out_full["raw"]),
        rtol=1e-5, atol=1e-5,
    )
    # tiny box capacity -> box-list overflow -> every segment becomes a
    # candidate (conservative, just slow). Here the segment capacity
    # still holds them all, so the render must stay exact with no
    # overflow flag; at scale the seg-capacity overflow flag escalates
    # the engine ladder instead.
    m_of = models.AniNeRF(
        num_train_frames=3, eval_keep_frac=0.5, norm_th=0.2,
        slab_filter=4, slab_box_capacity=1,
    )
    out_of = jax.jit(
        lambda p: m_of.apply(p, wpts, vd, z, frame, train=False,
                             analytic_z=True)
    )(params)
    assert not bool(np.asarray(out_of["compact_overflow"]).any())
    np.testing.assert_allclose(
        np.asarray(out_of["raw"]), np.asarray(out_full["raw"]),
        rtol=1e-5, atol=1e-5,
    )


def test_occupied_supercell_boxes_conservative(rng):
    """Every point with trilerped distance < th must lie inside one of
    the returned boxes — including out-of-bounds points, which clamp to
    the border cell (boxes touching the boundary extend to infinity)."""
    from animatable_nerf_tpu.core.grid import (
        pack_corner_volume, pts_sample_blend_weights_packed,
    )
    from animatable_nerf_tpu.models.common import occupied_supercell_boxes

    vol = rng.rand(9, 7, 8).astype(np.float32) * 0.3
    bounds = jnp.asarray(
        np.array([[-0.4, -0.3, -0.2], [0.5, 0.4, 0.6]], np.float32)
    )
    th = 0.1
    lo, hi, overflow = map(
        np.asarray,
        occupied_supercell_boxes(jnp.asarray(vol), bounds, th, 2, 64),
    )
    assert not overflow.any()
    # sample points well beyond the bounds to exercise border clamping
    pts = (rng.rand(20000, 3).astype(np.float32) * 2.4 - 1.2)
    dvals = np.asarray(
        pts_sample_blend_weights_packed(
            jnp.asarray(pts),
            pack_corner_volume(jnp.asarray(vol)[..., None]),
            bounds, n_channels=1,
        )
    )[..., 0]
    inside_any = (
        (pts[:, None, :] >= lo[None]) & (pts[:, None, :] <= hi[None])
    ).all(-1).any(-1)
    passing = dvals < th
    assert passing.any(), "test scene must have in-shell points"
    assert not (passing & ~inside_any).any()


def test_slab_span_covers_in_box_samples(rng):
    """Any sample with parameter z inside a box must satisfy
    span_lo <= z <= span_hi for its ray."""
    from animatable_nerf_tpu.models.common import slab_span

    lo = rng.rand(5, 3).astype(np.float32) * 0.4 - 0.5
    hi = lo + rng.rand(5, 3).astype(np.float32) * 0.6 + 0.05
    o = rng.randn(64, 3).astype(np.float32) * 2.0
    d = rng.randn(64, 3).astype(np.float32)
    span_lo, span_hi = map(
        np.asarray,
        slab_span(jnp.asarray(o), jnp.asarray(d), jnp.asarray(lo),
                  jnp.asarray(hi)),
    )
    t = np.linspace(-3.0, 3.0, 41, dtype=np.float32)
    pts = o[:, None, :] + d[:, None, :] * t[None, :, None]
    in_any = (
        (pts[:, :, None, :] >= lo[None, None])
        & (pts[:, :, None, :] <= hi[None, None])
    ).all(-1).any(-1)
    covered = (t[None, :] >= span_lo[:, None] - 1e-4) & (
        t[None, :] <= span_hi[:, None] + 1e-4
    )
    assert not (in_any & ~covered).any()
    # selectivity: a ray that misses every box must get an EMPTY span
    # (this catches the dead-slot/padded-box failure mode where value-
    # sorted slabs turn lo > hi boxes into infinite ones)
    center = 0.5 * (lo.mean(0) + hi.mean(0))
    away_o = (center + np.array([0.0, 10.0, 0.0], np.float32))[None]
    away_d = np.array([[1.0, 0.0, 0.0]], np.float32)  # line misses all boxes
    slo, shi = map(
        np.asarray,
        slab_span(jnp.asarray(away_o), jnp.asarray(away_d),
                  jnp.asarray(lo), jnp.asarray(hi)),
    )
    assert slo[0] > shi[0]


def test_volume_lipschitz_bound_certifies_distance_field(rng):
    """A true distance field certifies at ~<=sqrt(3); the bound is an
    upper bound on the interpolant's Lipschitz constant."""
    from animatable_nerf_tpu.models.common import volume_lipschitz_bound

    verts = rng.randn(64, 3).astype(np.float32) * 0.3
    b = np.stack([verts.min(0) - 0.1, verts.max(0) + 0.1])
    axes = [np.linspace(b[0][i], b[1][i], 12) for i in range(3)]
    g = np.stack(np.meshgrid(*axes, indexing="ij"), -1).reshape(-1, 3)
    d = np.sqrt(((g[:, None, :] - verts[None]) ** 2).sum(-1).min(-1))
    lip = float(volume_lipschitz_bound(
        jnp.asarray(d.reshape(12, 12, 12)), jnp.asarray(b)
    ))
    assert lip <= np.sqrt(3.0) + 1e-3
    # noise certifies much higher — the margin self-protects
    lip_noise = float(volume_lipschitz_bound(
        jnp.asarray(rng.rand(12, 12, 12).astype(np.float32)),
        jnp.asarray(b),
    ))
    assert lip_noise > lip


def test_aligned_empty_scene_compaction_bounded(data):
    """Empty-frame behavior of the conservative compacted eval: when no
    point passes the shell filter, exactly one forced point may render
    (possibly a different one than the dense path's weighted-argmin),
    and the output stays finite with at most one contributing sample."""
    frame, (wpts, vd, z) = data
    # push every point far out of the shell
    far = dict(frame)
    far["pvertices"] = frame["pvertices"] + 50.0
    m = models.AlignedLBW(num_latents=3, eval_keep_frac=1.0)
    params = m.init(jax.random.PRNGKey(0), wpts, vd, z, far, train=False)
    out = jax.jit(
        lambda p: m.apply(p, wpts, vd, z, far, train=False)
    )(params)
    raw = np.asarray(out["raw"]).reshape(-1, 4)
    assert np.isfinite(raw).all()
    assert (np.abs(raw).sum(-1) > 0).sum() <= 1


@pytest.mark.parametrize(
    "name", ["aninerf", "aligned_lbw", "nerf_pdf", "sdf_pdf", "neus_pdf"]
)
def test_dense_train_immune_to_garbage_at_masked_points(name, data):
    """The reference boolean-gathers in-shell points before the warp; the
    TPU dense path computes everything and masks afterwards. Masked-out
    points must therefore be SANITIZED before the bw-field/LBS warp
    (models/common.py substitute_masked): a far point with inf
    coordinates — the limiting case of the drifted-bw singular-blend NaN
    that poisoned a real AlignedLBW training run — must leave the loss
    value AND its gradients finite."""
    from animatable_nerf_tpu.train.losses import compute_losses

    frame, (wpts, vd, z) = data
    cls = models.MODELS[name]
    kwargs = dict(norm_th=0.5, num_eval_frames=0)
    if name == "aninerf":
        model = cls(num_train_frames=2, norm_th=0.5)
    elif name in ("nerf_pdf", "sdf_pdf", "neus_pdf"):
        model = cls(num_latents=2)
    else:
        model = cls(num_latents=2, norm_th=0.5)

    # poison two sample points with inf — guaranteed masked out (their
    # filter distance is inf; argmin forcing picks a finite point)
    wbad = np.asarray(wpts).copy()
    wbad[0, 0] = np.inf
    wbad[3, 2] = np.inf
    wbad = jnp.asarray(wbad)

    params = model.init(jax.random.PRNGKey(0), wbad, vd, z, frame, train=True)
    batch = {
        "rgb": jnp.zeros((R_RAYS, 3)),
        "mask_at_box": jnp.ones(R_RAYS, bool),
    }

    def loss_fn(p):
        out = model.apply(p, wbad, vd, z, frame, train=True)
        from animatable_nerf_tpu.core.composite import raw2outputs
        rgb_map, _, _, _, _ = raw2outputs(out["raw"], z, white_bkgd=False)
        out = dict(out, rgb_map=rgb_map)
        loss, _ = compute_losses(out, batch, jnp.asarray(0))
        return loss

    loss, grads = jax.value_and_grad(loss_fn)(params)
    assert np.isfinite(float(loss)), f"{name}: loss not finite"
    leaves = jax.tree_util.tree_leaves(grads)
    for g in leaves:
        assert np.isfinite(np.asarray(g)).all(), f"{name}: non-finite grad"


# ------------------------------------------------- compute_dtype plumbing
def test_compute_dtype_config_reaches_model(data, tmp_path):
    """VERDICT-r2 item 5: the `compute_dtype` config key must select the
    MLP-trunk dtype through make_model for every family (previously a
    silent no-op key), and the bf16 variant must stay within the bench's
    0.02 rgb-delta quality guard vs the f32 render."""
    from animatable_nerf_tpu.config import load_config
    from animatable_nerf_tpu.models.registry import make_model

    c = tmp_path / "c.yaml"
    c.write_text("exp_name: x\nnetwork_module: sdf_pdf\nnum_latent_code: 3\n")
    cfg16 = load_config(str(c), opts=["compute_dtype", "bfloat16"])
    m16 = make_model(cfg16)
    assert m16.dtype == jnp.bfloat16
    cfg32 = load_config(str(c))
    m32 = make_model(cfg32)
    assert m32.dtype == jnp.float32

    # every non-baseline family receives the key
    for mod in ("aninerf", "aligned_lbw", "aligned_pbw", "aligned_smpl",
                "aligned_lbw_pdf", "nerf_pdf", "neus_pdf"):
        c.write_text(
            f"exp_name: x\nnetwork_module: {mod}\nnum_latent_code: 3\n"
            "num_train_frame: 3\n"
        )
        assert make_model(
            load_config(str(c), opts=["compute_dtype", "bfloat16"])
        ).dtype == jnp.bfloat16

    # unknown values fail loudly (no silent no-op keys)
    c.write_text("exp_name: x\nnetwork_module: sdf_pdf\nnum_latent_code: 3\n")
    with pytest.raises(ValueError, match="compute_dtype"):
        make_model(load_config(str(c), opts=["compute_dtype", "float16"]))

    # params are f32 in both variants; bf16 apply stays within the guard
    frame, (wpts, vd, z) = data
    params = jax.jit(
        lambda: m32.init(jax.random.PRNGKey(0), wpts, vd, z, frame,
                         train=False)
    )()
    out32 = jax.jit(
        lambda p: m32.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    out16 = jax.jit(
        lambda p: m16.apply(p, wpts, vd, z, frame, train=False)
    )(params)
    delta = float(jnp.abs(out16["raw"][..., :3] - out32["raw"][..., :3]).max())
    assert delta < 0.02, f"bf16 rgb delta {delta} exceeds the quality guard"
