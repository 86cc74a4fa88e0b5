"""Golden parity against the ACTUAL reference code (/root/reference).

Unlike tests/test_parity_torch.py (which rebuilds the torch
architectures inside the test), these tests import the reference's own
network modules through tests/ref_oracle.py, construct the reference
`Network()` per family, export its live `state_dict()` through
compat/torch_import.py, and run both implementations on identical
inputs. This is the strongest available ≤0.1 dB evidence without the
licensed datasets: the oracle is the reference code itself.

Covered oracles:
  lib/networks/bw_deform/tpose_nerf_network.py:139-215  (AniNeRF)
  + the novel-pose (stage-2) branch :93-94, 278-315
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import ref_oracle
from animatable_nerf_tpu import models
from animatable_nerf_tpu.compat import torch_import
from animatable_nerf_tpu.core import rigid_transforms, big_pose_A

N_TRAIN_FRAME = 3
N_EVAL_FRAME = 2
R_RAYS, S = 12, 8
N_VERTS = 96

PARENTS = np.array(
    [0, 0, 0, 0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 9, 9, 12, 13, 14, 16, 17,
     18, 19, 20, 21]
)


def _np_batch(rng, grid=True):
    """One synthetic frame as numpy, shared by both frameworks."""
    joints = (rng.randn(24, 3) * 0.2).astype(np.float32)
    poses = (rng.randn(24, 3) * 0.1).astype(np.float32)
    A = np.asarray(rigid_transforms(poses, joints, PARENTS), np.float32)
    big_A = np.asarray(big_pose_A(jnp.asarray(joints), PARENTS), np.float32)
    verts = (rng.randn(N_VERTS, 3) * 0.3).astype(np.float32)
    w = rng.rand(N_VERTS, 24).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    bounds = np.stack([verts.min(0) - 0.1, verts.max(0) + 0.1]).astype(
        np.float32
    )
    batch = {
        "R": np.eye(3, dtype=np.float32),
        "Th": np.zeros((1, 3), np.float32),
        "A": A,
        "big_A": big_A,
        "poses": poses.reshape(-1),
        "weights": w,
        "pvertices": verts,
        "tvertices": verts,
        "pbounds": bounds,
        "tbounds": bounds,
        "wbounds": bounds,
        "latent_index": np.asarray(1, np.int64),
        "bw_latent_index": np.asarray(1, np.int64),
    }
    if grid:
        # distance channel in [0, 0.12]: mixes kept/filtered at
        # norm_th 0.05 like real data
        pbw = rng.rand(8, 8, 8, 25).astype(np.float32)
        pbw[..., 24] *= 0.12
        tbw = rng.rand(8, 8, 8, 25).astype(np.float32)
        tbw[..., 24] *= 0.12
        batch["pbw"] = pbw
        batch["tbw"] = tbw
    return batch


def _np_rays(rng, bounds):
    """Rays through the volume + the reference renderer's z/dists
    (tpose_renderer.py:26-27, 63-66)."""
    center = bounds.mean(0)
    ray_o = center + np.array([0, 0, -2.0], np.float32) + 0.1 * rng.randn(
        R_RAYS, 3
    ).astype(np.float32)
    target = center + 0.2 * rng.randn(R_RAYS, 3).astype(np.float32)
    ray_d = target - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    near = np.full((R_RAYS,), 1.4, np.float32)
    far = np.full((R_RAYS,), 2.6, np.float32)
    t = np.linspace(0.0, 1.0, S, dtype=np.float32)
    z_vals = near[:, None] * (1 - t) + far[:, None] * t
    wpts = ray_o[:, None] + ray_d[:, None] * z_vals[..., None]
    dists = np.concatenate(
        [z_vals[:, 1:] - z_vals[:, :-1], z_vals[:, -1:] * 0 + (
            z_vals[:, -1:] - z_vals[:, -2:-1]
        )], axis=1,
    )
    return (
        wpts.astype(np.float32), ray_d.astype(np.float32),
        z_vals.astype(np.float32), dists.astype(np.float32),
        ray_o.astype(np.float32), near, far,
    )


def _t(x):
    return torch.from_numpy(np.asarray(x))


def _torch_batch(batch):
    """numpy frame -> the reference's batched tensor dict
    (tpose_dataset.py:236-277 after default_collate). Tensors are
    cloned: several reference forwards MUTATE batch['tbounds'] in place
    (anisdf_pdf_network.py:204-206) and from_numpy shares memory."""
    tb = {}
    for k, v in batch.items():
        tv = _t(v).clone()
        if k in ("latent_index", "bw_latent_index"):
            tb[k] = tv.reshape(1)
        else:
            tb[k] = tv[None]
    return tb


def _jax_frame(batch):
    f = {k: jnp.asarray(v) for k, v in batch.items()}
    f["latent_index"] = jnp.asarray(batch["latent_index"], jnp.int32)
    f["bw_latent_index"] = jnp.asarray(batch["bw_latent_index"], jnp.int32)
    return f


@pytest.fixture(scope="module")
def aninerf_pair():
    """(reference torch Network, our AniNeRF + converted params, cfg)."""
    cfg = ref_oracle.install(
        num_train_frame=N_TRAIN_FRAME,
        num_eval_frame=N_EVAL_FRAME,
        aninerf_animation=True,  # constructs novel_pose_bw too
        norm_th=0.05,
        train_th=0.1,
    )
    mod = ref_oracle.load("lib.networks.bw_deform.tpose_nerf_network")
    torch.manual_seed(7)
    ref_net = mod.Network().eval().double().float()
    state = {k: v.detach().numpy() for k, v in ref_net.state_dict().items()}
    params = jax.tree_util.tree_map(
        jnp.asarray, torch_import.convert_aninerf(state)
    )
    ours = models.AniNeRF(
        num_train_frames=N_TRAIN_FRAME, num_eval_frames=N_EVAL_FRAME,
        norm_th=0.05, train_th=0.1, eval_keep_frac=0.0,
    )
    return ref_net, ours, params, cfg


class TestAniNeRFGolden:
    def _run(self, aninerf_pair, novel_pose):
        ref_net, ours, params, cfg = aninerf_pair
        cfg.test_novel_pose = novel_pose
        rng = np.random.RandomState(11)
        batch = _np_batch(rng)
        wpts, ray_d, z_vals, dists, *_ = _np_rays(rng, batch["pbounds"])
        tb = _torch_batch(batch)
        vd_flat = np.repeat(ray_d[:, None], S, axis=1).reshape(-1, 3)
        with torch.no_grad():
            ret = ref_net(
                _t(wpts.reshape(-1, 3)), _t(vd_flat),
                _t(dists.reshape(-1)), tb,
            )
        out = jax.jit(
            lambda p: ours.apply(
                p, jnp.asarray(wpts), jnp.asarray(ray_d),
                jnp.asarray(z_vals), _jax_frame(batch), train=True,
                novel_pose=novel_pose,
            )
        )(params)
        return ret, out

    @pytest.mark.parametrize("novel_pose", [False, True])
    def test_raw_matches_reference(self, aninerf_pair, novel_pose):
        ret, out = self._run(aninerf_pair, novel_pose)
        want = ret["raw"][0].numpy().reshape(R_RAYS, S, 4)
        got = np.asarray(out["raw"])
        # some points survive, some are filtered (test is vacuous otherwise)
        alive = np.abs(want).sum(-1) > 0
        assert 0 < alive.sum() < R_RAYS * S
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)

    def test_bw_consistency_pair_matches_reference(self, aninerf_pair):
        """pbw/tbw after the alpha>train_th selection
        (tpose_nerf_network.py:192-196) vs our compacted pbw[bw_mask]."""
        ret, out = self._run(aninerf_pair, novel_pose=False)
        want_pbw = ret["pbw"][0].numpy()
        want_tbw = ret["tbw"][0].numpy()
        mask = np.asarray(out["bw_mask"])
        got_pbw = np.asarray(out["pbw"])[mask]
        got_tbw = np.asarray(out["tbw"])[mask]
        assert want_pbw.shape == got_pbw.shape
        np.testing.assert_allclose(got_pbw, want_pbw, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(got_tbw, want_tbw, rtol=1e-4, atol=1e-5)

    def test_density_path_matches_reference(self, aninerf_pair):
        """calculate_alpha (mesh extraction oracle,
        tpose_nerf_network.py:105-137) vs our density()."""
        ref_net, ours, params, cfg = aninerf_pair
        cfg.test_novel_pose = False
        rng = np.random.RandomState(12)
        batch = _np_batch(rng)
        pts = (rng.rand(64, 3).astype(np.float32) * (
            batch["pbounds"][1] - batch["pbounds"][0]
        ) + batch["pbounds"][0])
        tb = _torch_batch(batch)
        with torch.no_grad():
            want = ref_net.calculate_alpha(_t(pts), tb).numpy()
        got = np.asarray(
            jax.jit(
                lambda p: ours.apply(
                    p, pts, _jax_frame(batch), method=ours.density
                )
            )(params)
        )
        # reference returns raw density only on surviving points
        # (zeros elsewhere); ours masks identically
        assert (np.abs(want) > 0).any()
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


# --------------------------------------------------------------------------
# KNN families (aligned_* / *_pdf / anisdf_*): oracle runs the reference
# modules with the brute-force exact knn_points stub
# --------------------------------------------------------------------------

KNN_NORM_TH = 0.25  # gives a live/dead mix at this synthetic vertex scale


def _run_ref_knn(ref_net, batch, wpts, ray_d, dists, grad=False):
    tb = _torch_batch(batch)
    vd_flat = np.repeat(ray_d[:, None], S, axis=1).reshape(-1, 3)
    args = (_t(wpts.reshape(-1, 3)), _t(vd_flat), _t(dists.reshape(-1)), tb)
    if grad:
        ret = ref_net(*args)
        return {
            k: v.detach() if torch.is_tensor(v) else v for k, v in ret.items()
        }
    with torch.no_grad():
        return ref_net(*args)


def _run_ours(ours, params, batch, wpts, ray_d, z_vals, **kw):
    return jax.jit(
        lambda p: ours.apply(
            p, jnp.asarray(wpts), jnp.asarray(ray_d), jnp.asarray(z_vals),
            _jax_frame(batch), **kw,
        )
    )(params)


def _ref_net(module_name, seed, **cfg_over):
    ref_oracle.install(
        num_train_frame=N_TRAIN_FRAME, num_eval_frame=N_EVAL_FRAME,
        num_latent_code=N_TRAIN_FRAME, norm_th=KNN_NORM_TH, train_th=0.1,
        **cfg_over,
    )
    mod = ref_oracle.load("lib.networks.bw_deform." + module_name)
    torch.manual_seed(seed)
    net = mod.Network().eval()
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    return net, state


def _assert_alive_mix(want_raw):
    alive = np.abs(want_raw).sum(-1) > 0
    assert 0 < alive.sum() < want_raw.shape[0]


class TestNeRFPDFGolden:
    def test_forward_matches_reference(self):
        net, state = _ref_net("aligned_aninerf_pdf_network", 21)
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_nerf_pdf(state)
        )
        ours = models.NeRFPDF(num_latents=N_TRAIN_FRAME, eval_keep_frac=0.0)
        rng = np.random.RandomState(31)
        batch = _np_batch(rng, grid=False)
        wpts, ray_d, z_vals, dists, *_ = _np_rays(rng, batch["tbounds"])
        ret = _run_ref_knn(net, batch, wpts, ray_d, dists)
        out = _run_ours(ours, params, batch, wpts, ray_d, z_vals, train=True)
        want = ret["raw"][0].numpy()
        _assert_alive_mix(want)
        got = np.asarray(out["raw"]).reshape(-1, 4)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
        # resd over surviving points (reference computes it post-filter)
        mask = np.asarray(out["resd_mask"])
        np.testing.assert_allclose(
            np.asarray(out["resd"])[mask], ret["resd"][0].numpy(),
            rtol=2e-4, atol=2e-5,
        )


class TestSDFPDFGolden:
    def _pair(self):
        net, state = _ref_net("anisdf_pdf_network", 23)
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_sdf_pdf(state)
        )
        ours = models.SDFPDF(num_latents=N_TRAIN_FRAME, eval_keep_frac=0.0)
        return net, ours, params

    def test_forward_matches_reference(self):
        net, ours, params = self._pair()
        rng = np.random.RandomState(37)
        batch = _np_batch(rng, grid=False)
        wpts, ray_d, z_vals, dists, *_ = _np_rays(rng, batch["tbounds"])
        # grad-enabled oracle run: autograd normals + observed_gradients
        # only exist on the grad path (anisdf_pdf_network.py:197-199)
        ret = _run_ref_knn(net, batch, wpts, ray_d, dists, grad=True)
        out = _run_ours(ours, params, batch, wpts, ray_d, z_vals, train=True)
        want = ret["raw"][0].numpy()
        _assert_alive_mix(want)
        np.testing.assert_allclose(
            np.asarray(out["raw"]).reshape(-1, 4), want,
            rtol=5e-4, atol=5e-5,
        )
        # sdf carries the +10 masked fill (anisdf_pdf_network.py:218-219)
        np.testing.assert_allclose(
            np.asarray(out["sdf"]).reshape(-1),
            ret["sdf"][0, :, 0].numpy(), rtol=2e-4, atol=2e-5,
        )
        mask = np.asarray(out["resd_mask"])
        np.testing.assert_allclose(
            np.asarray(out["resd"])[mask], ret["resd"][0].numpy(),
            rtol=2e-4, atol=2e-5,
        )
        # autograd normals (jax.grad vs torch.autograd.grad)
        np.testing.assert_allclose(
            np.asarray(out["gradients"])[mask],
            ret["gradients"][0].numpy(), rtol=5e-4, atol=5e-5,
        )
        # observed-space eikonal gradients at |sdf| < 0.02 points: the
        # reference only emits them when such points exist
        # (anisdf_pdf_network.py:194-199) — parity means the selection
        # agrees either way
        og_mask = np.asarray(out["observed_grad_mask"])
        if "observed_gradients" in ret:
            np.testing.assert_allclose(
                np.asarray(out["observed_gradients"])[og_mask],
                ret["observed_gradients"][0].numpy(), rtol=5e-4, atol=5e-5,
            )
        else:
            assert og_mask.sum() == 0

    def test_observed_gradients_match_reference(self):
        """Direct oracle for the observed-space eikonal gradient
        d/dx[sdf(x + resd(x))] (anisdf_pdf_network.py:140-154
        gradient_of_deformed_sdf) — the forward only exercises it when
        |sdf| < 0.02 points exist, so pin the method on arbitrary
        canonical points here."""
        net, ours, params = self._pair()
        rng = np.random.RandomState(47)
        batch = _np_batch(rng, grid=False)
        pts = (rng.randn(40, 3) * 0.3).astype(np.float32)
        tb = _torch_batch(batch)
        want, want_sdf = net.gradient_of_deformed_sdf(_t(pts)[None], tb)
        got = np.asarray(
            jax.jit(
                lambda p: ours.apply(
                    p, jnp.asarray(pts), _jax_frame(batch),
                    method=ours._observed_grad,
                )
            )(params)
        )
        np.testing.assert_allclose(
            got, want.detach().numpy()[0], rtol=5e-4, atol=5e-5
        )

    def test_sdf_query_matches_reference(self):
        """get_sdf (mesh-extraction oracle, anisdf_pdf_network.py:226-260)
        vs our sdf()."""
        net, ours, params = self._pair()
        rng = np.random.RandomState(41)
        batch = _np_batch(rng, grid=False)
        pts = (rng.rand(80, 3).astype(np.float32) * (
            batch["tbounds"][1] - batch["tbounds"][0]
        ) + batch["tbounds"][0])
        with torch.no_grad():
            want = net.get_sdf(_t(pts), _torch_batch(batch)).numpy()[:, 0]
        got = np.asarray(
            jax.jit(
                lambda p: ours.apply(
                    p, pts, _jax_frame(batch), method=ours.sdf
                )
            )(params)
        )
        assert (want < 10.0).any() and (want == 10.0).any()
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


class TestNeuSPDFGolden:
    def test_forward_matches_reference(self):
        net, state = _ref_net("anisdf_neus_pdf_network", 29, N_samples=S)
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_neus_pdf(state)
        )
        ours = models.NeuSPDF(num_latents=N_TRAIN_FRAME, eval_keep_frac=0.0)
        rng = np.random.RandomState(43)
        batch = _np_batch(rng, grid=False)
        wpts, ray_d, z_vals, dists, *_ = _np_rays(rng, batch["tbounds"])
        ret = _run_ref_knn(net, batch, wpts, ray_d, dists, grad=True)
        out = _run_ours(ours, params, batch, wpts, ray_d, z_vals, train=True)
        want = ret["raw"][0].numpy()
        _assert_alive_mix(want)
        np.testing.assert_allclose(
            np.asarray(out["raw"]).reshape(-1, 4), want,
            rtol=5e-4, atol=5e-5,
        )
        np.testing.assert_allclose(
            np.asarray(out["sdf"]).reshape(-1),
            ret["sdf"][0, :, 0].numpy(), rtol=2e-4, atol=2e-5,
        )


def _aligned_case(module_name, seed, converter, our_cls, **our_kw):
    net, state = _ref_net(module_name, seed)
    params = jax.tree_util.tree_map(jnp.asarray, converter(state))
    ours = our_cls(
        num_latents=N_TRAIN_FRAME, norm_th=KNN_NORM_TH, train_th=0.1,
        eval_keep_frac=0.0, **our_kw,
    )
    rng = np.random.RandomState(seed + 100)
    batch = _np_batch(rng, grid=False)
    wpts, ray_d, z_vals, dists, *_ = _np_rays(rng, batch["tbounds"])
    ret = _run_ref_knn(net, batch, wpts, ray_d, dists)
    out = _run_ours(ours, params, batch, wpts, ray_d, z_vals, train=True)
    return ret, out


def _check_aligned(ret, out, bw=True, resd=False):
    want = ret["raw"][0].numpy()
    _assert_alive_mix(want)
    np.testing.assert_allclose(
        np.asarray(out["raw"]).reshape(-1, 4), want, rtol=2e-4, atol=2e-5
    )
    if bw:
        mask = np.asarray(out["bw_mask"])
        got_pbw = np.asarray(out["pbw"])[mask]
        got_tbw = np.asarray(out["tbw"])[mask]
        np.testing.assert_allclose(
            got_pbw, ret["pbw"][0].numpy(), rtol=2e-4, atol=2e-5
        )
        np.testing.assert_allclose(
            got_tbw, ret["tbw"][0].numpy(), rtol=2e-4, atol=2e-5
        )
    if resd:
        mask = np.asarray(out["resd_mask"])
        np.testing.assert_allclose(
            np.asarray(out["resd"])[mask], ret["resd"][0].numpy(),
            rtol=2e-4, atol=2e-5,
        )


class TestAlignedGolden:
    def test_lbw_matches_reference(self):
        ret, out = _aligned_case(
            "aligned_aninerf_lbw_network", 51,
            torch_import.convert_aligned_lbw, models.AlignedLBW,
        )
        _check_aligned(ret, out, bw=True)

    def test_pbw_matches_reference(self):
        ret, out = _aligned_case(
            "aligned_aninerf_pbw_network", 53,
            torch_import.convert_aligned_pbw, models.AlignedPBW,
        )
        _check_aligned(ret, out, bw=True)

    def test_smpl_matches_reference(self):
        ret, out = _aligned_case(
            "aligned_aninerf_smpl_network", 57,
            torch_import.convert_aligned_smpl, models.AlignedSMPL,
        )
        _check_aligned(ret, out, bw=False)

    def test_lbw_pdf_matches_reference(self):
        ret, out = _aligned_case(
            "aligned_aninerf_lbw_pdf_network", 59,
            torch_import.convert_aligned_lbw_pdf, models.AlignedLBWPDF,
        )
        _check_aligned(ret, out, bw=True, resd=True)

    def test_lbw_novel_pose_matches_reference(self):
        """Stage-2 novel-pose branch (aligned_aninerf_lbw_network.py:69-71)."""
        ref_oracle.install(
            num_train_frame=N_TRAIN_FRAME, num_eval_frame=N_EVAL_FRAME,
            num_latent_code=N_TRAIN_FRAME, norm_th=KNN_NORM_TH,
            train_th=0.1, aninerf_animation=True, test_novel_pose=True,
        )
        mod = ref_oracle.load("lib.networks.bw_deform.aligned_aninerf_lbw_network")
        torch.manual_seed(61)
        net = mod.Network().eval()
        state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_aligned_lbw(state)
        )
        assert "novel_pose_bw" in params["params"]
        ours = models.AlignedLBW(
            num_latents=N_TRAIN_FRAME, num_eval_frames=N_EVAL_FRAME,
            norm_th=KNN_NORM_TH, train_th=0.1, eval_keep_frac=0.0,
        )
        rng = np.random.RandomState(161)
        batch = _np_batch(rng, grid=False)
        wpts, ray_d, z_vals, dists, *_ = _np_rays(rng, batch["tbounds"])
        ret = _run_ref_knn(net, batch, wpts, ray_d, dists)
        out = _run_ours(
            ours, params, batch, wpts, ray_d, z_vals, train=True,
            novel_pose=True,
        )
        _check_aligned(ret, out, bw=True)


# --------------------------------------------------------------------------
# Golden pixels: the reference Renderer's chunk loop
# (tpose_renderer.py:159-186) vs our render_rays on identical
# weights/rays — the second half of the <=0.1 dB contract
# --------------------------------------------------------------------------

N_PIX_RAYS = 2500  # > 2048: exercises the reference's chunk boundary


def _pixel_rays(rng, bounds, n_rays):
    center = bounds.mean(0)
    ray_o = center + np.array([0, 0, -2.0], np.float32) + 0.1 * rng.randn(
        n_rays, 3
    ).astype(np.float32)
    target = center + 0.25 * rng.randn(n_rays, 3).astype(np.float32)
    ray_d = target - ray_o
    ray_d /= np.linalg.norm(ray_d, axis=-1, keepdims=True)
    near = np.full((n_rays,), 1.4, np.float32)
    far = np.full((n_rays,), 2.6, np.float32)
    occ = (rng.rand(n_rays) > 0.5).astype(np.float32)
    return ray_o.astype(np.float32), ray_d, near, far, occ


def _delta_psnr(a, b):
    mse = float(np.mean((np.asarray(a, np.float64) - np.asarray(b, np.float64)) ** 2))
    return -10.0 * np.log10(max(mse, 1e-20))


def _run_ref_renderer(net, batch, ray_o, ray_d, near, far, occ):
    mod = ref_oracle.load("lib.networks.renderer.tpose_renderer")
    renderer = mod.Renderer(net)
    tb = _torch_batch(batch)
    tb.update(
        ray_o=_t(ray_o)[None], ray_d=_t(ray_d)[None],
        near=_t(near)[None], far=_t(far)[None],
        occupancy=_t(occ)[None],
    )
    with torch.no_grad():
        return renderer.render(tb)


class TestGoldenPixels:
    @pytest.mark.parametrize("keep_frac", [0.0, 0.5])
    def test_aninerf_pixels_match_reference(self, keep_frac):
        """Dense masked path AND the production survivor-compacted eval
        path both reproduce the reference's pixels (> 60 dB delta).

        keep_frac 0.5: the synthetic distance channel keeps ~42% of
        samples, so the production 25% rung would overflow (the engine
        ladder escalates in that case; compaction parity under overflow
        is exercised by tests/test_render.py)."""
        from animatable_nerf_tpu.render.renderer import (
            RenderSettings, render_rays,
        )

        cfg = ref_oracle.install(
            num_train_frame=N_TRAIN_FRAME, num_eval_frame=N_EVAL_FRAME,
            norm_th=0.05, train_th=0.1, N_samples=S, perturb=0,
        )
        mod = ref_oracle.load("lib.networks.bw_deform.tpose_nerf_network")
        torch.manual_seed(77)
        net = mod.Network().eval()
        state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_aninerf(state)
        )
        ours = models.AniNeRF(
            num_train_frames=N_TRAIN_FRAME, norm_th=0.05, train_th=0.1,
            eval_keep_frac=keep_frac,
        )
        rng = np.random.RandomState(71)
        batch = _np_batch(rng)
        ray_o, ray_d, near, far, occ = _pixel_rays(
            rng, batch["pbounds"], N_PIX_RAYS
        )
        ret = _run_ref_renderer(net, batch, ray_o, ray_d, near, far, occ)
        rays = {
            "ray_o": jnp.asarray(ray_o), "ray_d": jnp.asarray(ray_d),
            "near": jnp.asarray(near), "far": jnp.asarray(far),
            "occupancy": jnp.asarray(occ),
        }
        settings = RenderSettings(n_samples=S, perturb=False)
        out = jax.jit(
            lambda p: render_rays(
                ours, p, rays, _jax_frame(batch), settings, train=False
            )
        )(params)
        if keep_frac > 0:
            assert not bool(out["compact_overflow"])
        want_rgb = ret["rgb_map"][0].numpy()
        assert (np.abs(want_rgb).sum(-1) > 0).any()
        psnr = _delta_psnr(out["rgb_map"], want_rgb)
        assert psnr > 60.0, f"rgb delta PSNR {psnr:.1f} dB"
        np.testing.assert_allclose(
            np.asarray(out["acc_map"]), ret["acc_map"][0].numpy(),
            rtol=1e-3, atol=1e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out["depth_map"]), ret["depth_map"][0].numpy(),
            rtol=1e-3, atol=1e-4,
        )

    def test_sdf_pdf_pixels_match_reference(self):
        """SDF-PDF flagship through both renderers, incl. the
        silhouette mask-loss tensors (tpose_renderer.py:134-152)."""
        from animatable_nerf_tpu.render.renderer import (
            RenderSettings, render_rays,
        )

        cfg = ref_oracle.install(
            num_train_frame=N_TRAIN_FRAME, num_eval_frame=N_EVAL_FRAME,
            num_latent_code=N_TRAIN_FRAME, N_samples=S, perturb=0,
        )
        mod = ref_oracle.load("lib.networks.bw_deform.anisdf_pdf_network")
        torch.manual_seed(79)
        net = mod.Network().eval()
        state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_sdf_pdf(state)
        )
        ours = models.SDFPDF(num_latents=N_TRAIN_FRAME, eval_keep_frac=0.25)
        rng = np.random.RandomState(73)
        batch = _np_batch(rng, grid=False)
        ray_o, ray_d, near, far, occ = _pixel_rays(
            rng, batch["tbounds"], 600
        )
        ret = _run_ref_renderer(net, batch, ray_o, ray_d, near, far, occ)
        rays = {
            "ray_o": jnp.asarray(ray_o), "ray_d": jnp.asarray(ray_d),
            "near": jnp.asarray(near), "far": jnp.asarray(far),
            "occupancy": jnp.asarray(occ),
        }
        settings = RenderSettings(n_samples=S, perturb=False)
        out = jax.jit(
            lambda p: render_rays(
                ours, p, rays, _jax_frame(batch), settings, train=True
            )
        )(params)
        want_rgb = ret["rgb_map"][0].numpy()
        assert (np.abs(want_rgb).sum(-1) > 0).any()
        psnr = _delta_psnr(out["rgb_map"], want_rgb)
        assert psnr > 60.0, f"rgb delta PSNR {psnr:.1f} dB"
        # silhouette tensors: the reference concatenates [in-mask rays
        # lacking an sdf sign change; out-of-mask rays] (renderer
        # :134-152); ours returns min_sdf + the two masks
        want_msk_sdf = ret["msk_sdf"][0].numpy()
        want_msk_label = ret["msk_label"][0].numpy()
        got_min_sdf = np.asarray(out["msk_sdf"])
        got_in = np.asarray(out["msk_in"])
        got_free = np.asarray(out["msk_free"])
        got_cat = np.concatenate(
            [got_min_sdf[got_in], got_min_sdf[got_free]]
        )
        got_lbl = np.concatenate(
            [np.ones(got_in.sum()), np.zeros(got_free.sum())]
        )
        assert got_cat.shape == want_msk_sdf.shape
        np.testing.assert_allclose(
            got_cat, want_msk_sdf, rtol=2e-4, atol=2e-5
        )
        np.testing.assert_array_equal(got_lbl, want_msk_label)


class TestGoldenVisibilityCarve:
    """VERDICT-r2 item 7: the one renderer variant not previously
    oracled — multi-view visibility carving
    (lib/networks/renderer/tpose_renderer_mmsk.py:14-57
    prepare_inside_pts + inside-only evaluation :59-95) vs
    render/visibility.py + render_rays(inside_fn=...)."""

    @pytest.mark.parametrize("keep_frac", [0.0, 0.5])
    def test_mmsk_pixels_match_reference(self, keep_frac):
        from animatable_nerf_tpu.render.renderer import (
            RenderSettings, render_rays,
        )
        from animatable_nerf_tpu.render.visibility import make_inside_fn

        cfg = ref_oracle.install(
            num_train_frame=N_TRAIN_FRAME, num_eval_frame=N_EVAL_FRAME,
            norm_th=0.05, train_th=0.1, N_samples=S, perturb=0,
        )
        mod = ref_oracle.load("lib.networks.bw_deform.tpose_nerf_network")
        torch.manual_seed(83)
        net = mod.Network().eval()
        state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_aninerf(state)
        )
        ours = models.AniNeRF(
            num_train_frames=N_TRAIN_FRAME, norm_th=0.05, train_th=0.1,
            eval_keep_frac=keep_frac,
        )
        rng = np.random.RandomState(89)
        batch = _np_batch(rng)
        n_rays = 300
        ray_o, ray_d, near, far, occ = _pixel_rays(
            rng, batch["pbounds"], n_rays
        )

        # two synthetic training views with central-disk masks: the
        # carve kills a real subset of samples (asserted non-vacuous)
        V, H, W = 2, 48, 48
        Ks = np.zeros((V, 3, 3), np.float32)
        RTs44 = np.zeros((V, 4, 4), np.float32)
        msks = np.zeros((V, H, W), np.uint8)
        center = batch["pbounds"].mean(0)
        for v in range(V):
            ang = 0.7 + 2.1 * v
            eye = center + 2.4 * np.array(
                [np.sin(ang), 0.15, np.cos(ang)], np.float32
            )
            fwd = center - eye
            fwd /= np.linalg.norm(fwd)
            right = np.cross(fwd, [0, 1, 0])
            right /= np.linalg.norm(right)
            down = np.cross(fwd, right)
            R = np.stack([right, down, fwd], 0).astype(np.float32)
            T = (-R @ eye).astype(np.float32)
            Ks[v] = np.array(
                [[60.0, 0, W / 2], [0, 60.0, H / 2], [0, 0, 1]], np.float32
            )
            RTs44[v, :3, :3] = R
            RTs44[v, :3, 3] = T
            RTs44[v, 3, 3] = 1.0
            yy, xx = np.mgrid[0:H, 0:W]
            msks[v] = (
                (yy - H / 2) ** 2 + (xx - W / 2) ** 2 < (H * 0.32) ** 2
            ).astype(np.uint8)

        # reference render through the mmsk chunk-loop renderer
        mmsk = ref_oracle.load("lib.networks.renderer.tpose_renderer_mmsk")
        renderer = mmsk.Renderer(net)
        tb = _torch_batch(batch)
        tb.update(
            ray_o=_t(ray_o)[None], ray_d=_t(ray_d)[None],
            near=_t(near)[None], far=_t(far)[None],
            Ks=_t(Ks)[None], RT=_t(RTs44)[None], msks=_t(msks)[None],
            H=_t(np.asarray(H, np.int64)), W=_t(np.asarray(W, np.int64)),
        )
        with torch.no_grad():
            ret = renderer.render(tb)
        want_rgb = ret["rgb_map"][0].numpy()
        want_acc = ret["acc_map"][0].numpy()

        rays = {
            "ray_o": jnp.asarray(ray_o), "ray_d": jnp.asarray(ray_d),
            "near": jnp.asarray(near), "far": jnp.asarray(far),
            "occupancy": jnp.asarray(occ),
        }
        settings = RenderSettings(n_samples=S, perturb=False)
        inside_fn = make_inside_fn(
            jnp.asarray(Ks), jnp.asarray(RTs44[:, :3, :]), jnp.asarray(msks)
        )
        out = jax.jit(
            lambda p: render_rays(
                ours, p, rays, _jax_frame(batch), settings, train=False,
                inside_fn=inside_fn,
            )
        )(params)

        # the carve must actually kill some-but-not-all lit pixels
        # relative to the uncarved render (else the test is vacuous)
        out_plain = jax.jit(
            lambda p: render_rays(
                ours, p, rays, _jax_frame(batch), settings, train=False
            )
        )(params)
        lit_plain = np.asarray(out_plain["acc_map"]) > 1e-4
        lit_carved = want_acc > 1e-4
        assert lit_carved.sum() < lit_plain.sum()
        assert lit_carved.sum() > 0

        psnr = _delta_psnr(out["rgb_map"], want_rgb)
        assert psnr > 60.0, f"carved rgb delta PSNR {psnr:.1f} dB"
        np.testing.assert_allclose(
            np.asarray(out["acc_map"]), want_acc, rtol=1e-3, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(out["depth_map"]), ret["depth_map"][0].numpy(),
            rtol=1e-3, atol=1e-4,
        )
