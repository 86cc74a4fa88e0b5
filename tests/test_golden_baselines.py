"""Golden parity for the image-space baselines against the reference's
own code (VERDICT-r2 item 6).

Covered oracles (imported in place through tests/ref_oracle.py):
  lib/networks/nhr/unet_model.py + unet_parts.py + models_lpf.py
    (the gated/blur-pool UNet both NT and NHR refine with)
  lib/networks/nt/nt.py + texture.py          (NT wholesale, exact)
  lib/networks/pointnet2/pointnet2_msg.py     (NHR's point encoder, on
    the CPU reimplementation of the lib/csrc/pointnet2 CUDA surface —
    ref_oracle._install_pointnet2_stub)

PCPR (the external CUDA splatter) stays excluded: it is not in this
image and has no reference Python path; its replacement
(ops/rasterize.py) is covered by shape/gradient tests and the e2e NHR
runs (PARITY.md documents the decision).

Both torch-BatchNorm modes are pinned: train-mode batch statistics
(frozen_stats=False — what our own training uses) and eval-mode running
statistics (frozen_stats=True — what torch-checkpoint serving uses,
with running stats perturbed first so the mode difference is real).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")

import ref_oracle
from animatable_nerf_tpu.baselines.unet import UNet
from animatable_nerf_tpu.baselines.nt import NT
from animatable_nerf_tpu.baselines.pointnet2_msg import PointNet2MSG
from animatable_nerf_tpu.compat import torch_import

UNET_WIDTHS = (64, 128, 256, 512, 512, 256, 128, 64, 32)


def _nhwc(x_nchw):
    return np.transpose(np.asarray(x_nchw), (0, 2, 3, 1))


@pytest.fixture(scope="module")
def unet_pair():
    ref_oracle.install()
    mod = ref_oracle.load("lib.networks.nhr.unet_model")
    torch.manual_seed(101)
    net = mod.UNet(16, 3, list(UNET_WIDTHS), use_maks=True,
                   no_modified=False)
    # perturb the running stats away from (0, 1) so the frozen-stats
    # comparison cannot pass by accident
    net.train()
    with torch.no_grad():
        for _ in range(2):
            net(torch.randn(1, 16, 64, 64))
    state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
    params = {
        "params": jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_nhr_unet(state, prefix="")
        )
    }
    return net, state, params


class TestGoldenUNet:
    def test_train_mode_batch_stats(self, unet_pair):
        net, _state, params = unet_pair
        rng = np.random.RandomState(7)
        x = rng.randn(1, 16, 64, 64).astype(np.float32)
        net.train()
        with torch.no_grad():
            want = net(torch.from_numpy(x)).numpy()
        ours = UNet(n_classes=3, layer_widths=UNET_WIDTHS, use_mask=True,
                    norm="batch", frozen_stats=False)
        got = np.asarray(
            jax.jit(lambda p: ours.apply(p, jnp.asarray(_nhwc(x))))(params)
        )
        np.testing.assert_allclose(
            got, _nhwc(want), rtol=2e-4, atol=2e-5
        )

    def test_eval_mode_running_stats(self, unet_pair):
        net, _state, params = unet_pair
        rng = np.random.RandomState(8)
        x = rng.randn(1, 16, 64, 64).astype(np.float32)
        net.eval()
        with torch.no_grad():
            want = net(torch.from_numpy(x)).numpy()
        ours = UNet(n_classes=3, layer_widths=UNET_WIDTHS, use_mask=True,
                    norm="batch", frozen_stats=True)
        got = np.asarray(
            jax.jit(lambda p: ours.apply(p, jnp.asarray(_nhwc(x))))(params)
        )
        # the two modes must genuinely differ (running stats perturbed)
        ours_batch = UNet(n_classes=3, layer_widths=UNET_WIDTHS,
                          use_mask=True, norm="batch", frozen_stats=False)
        got_batch = np.asarray(
            jax.jit(lambda p: ours_batch.apply(p, jnp.asarray(_nhwc(x))))(
                params
            )
        )
        assert np.abs(got - got_batch).max() > 1e-3
        np.testing.assert_allclose(
            got, _nhwc(want), rtol=2e-4, atol=2e-5
        )


class TestGoldenNT:
    def test_nt_network_matches_reference(self):
        """The full NT pipeline: 4-level texture pyramid grid_sample
        (align_corners=True) + UNet refine (nt.py:6-30, texture.py)."""
        ref_oracle.install()
        mod = ref_oracle.load("lib.networks.nt.nt")
        torch.manual_seed(103)
        net = mod.Network().train()
        # perturb running stats, then test BOTH modes
        rngw = np.random.RandomState(11)
        uv_w = rngw.rand(1, 64, 64, 2).astype(np.float32)
        msk_w = (rngw.rand(1, 64, 64) > 0.3).astype(np.float32)
        with torch.no_grad():
            net({"uv": torch.from_numpy(uv_w),
                 "uv_msk": torch.from_numpy(msk_w)})
        state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_nt(state)
        )
        rng = np.random.RandomState(12)
        uv = rng.rand(1, 64, 64, 2).astype(np.float32)
        msk = (rng.rand(1, 64, 64) > 0.3).astype(np.float32)
        tb = {"uv": torch.from_numpy(uv), "uv_msk": torch.from_numpy(msk)}
        for frozen, mode in ((False, "train"), (True, "eval")):
            getattr(net, mode)()
            with torch.no_grad():
                want = net(tb).numpy()  # (1, 4, H, W)
            ours = NT(size=1024, feature_dim=16, norm="batch",
                      frozen_stats=frozen)
            out = jax.jit(
                lambda p: ours.apply(
                    p, {"uv": jnp.asarray(uv[0]),
                        "uv_msk": jnp.asarray(msk[0])}, train=not frozen,
                )
            )(params)
            got = np.concatenate(
                [np.asarray(out["rgb_map"]),
                 np.asarray(out["mask"])[..., None]], axis=-1,
            )
            # atol 2e-4: the uv -> texel coordinate maps differ in float
            # path (torch: (uv*2-1+1)/2*(S-1); ours: uv*(S-1)) and the
            # 4-level pyramid sums the lerp noise (max ~8e-5 measured)
            np.testing.assert_allclose(
                got, _nhwc(want)[0], rtol=2e-4, atol=2e-4,
                err_msg=f"mode={mode}",
            )


class TestGoldenPointNet2:
    def test_msg_matches_reference(self):
        """Pointnet2MSG end to end on the stubbed CUDA surface: FPS,
        multi-radius ball grouping, shared MLPs with BatchNorm, max
        pooling, 3-NN inverse-distance feature propagation
        (pointnet2_msg.py:24-100, pointnet2_modules.py,
        pointnet2_utils.py). Small npoints keep the FPS selection far
        from ties (the two sides compute distances with different op
        orders)."""
        ref_oracle.install()
        mod = ref_oracle.load("lib.networks.pointnet2.pointnet2_msg")
        npoints = [128, 64, 32, 16]
        radii = [[0.1, 0.2], [0.2, 0.4], [0.4, 0.8], [0.8, 1.6]]
        torch.manual_seed(107)
        net = mod.Pointnet2MSG(
            input_channels=0, out_dim=18, npoints=npoints, radius=radii
        ).train()
        rng = np.random.RandomState(13)
        pts = (rng.randn(1, 512, 3) * 0.4).astype(np.float32)
        with torch.no_grad():
            net(torch.from_numpy(pts))  # perturb running stats
        state = {k: v.detach().numpy() for k, v in net.state_dict().items()}
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_pointnet2(state)
        )
        ours = PointNet2MSG(
            out_dim=18, npoints=tuple(npoints),
            radii=tuple(tuple(r) for r in radii),
        )
        pts2 = (rng.randn(1, 512, 3) * 0.4).astype(np.float32)
        for frozen, mode in ((False, "train"), (True, "eval")):
            getattr(net, mode)()
            with torch.no_grad():
                want = net(torch.from_numpy(pts2)).numpy()  # (1, C, N)
            m = ours.clone(frozen_stats=frozen)
            got = np.asarray(
                jax.jit(lambda p: m.apply(p, jnp.asarray(pts2)))(params)
            )
            want = np.transpose(want, (0, 2, 1))
            # the two sides compute pairwise distances with different op
            # orders, so a point at distance ~= radius can land in or out
            # of a ball differently — a legitimate knife-edge flip, not a
            # math mismatch (the primitives are pinned BIT-exactly on a
            # margin-checked cloud below). Require near-total agreement
            # and a tiny typical error.
            close = np.isclose(got, want, rtol=5e-4, atol=5e-5)
            frac = close.mean()
            assert frac > 0.97, f"mode={mode}: only {frac:.3%} close"
            assert np.median(np.abs(got - want)) < 1e-5

    def test_primitives_bit_match_oracle_stub(self):
        """ball_query / FPS / three_nn vs the CUDA-semantics stub,
        EXACT — on a cloud resampled until every pairwise distance
        clears the ball radii by a margin and FPS selections are
        tie-free, so float-path differences cannot flip selections."""
        import torch as th
        from animatable_nerf_tpu.ops import pointnet2 as pn2

        stub = ref_oracle.load("lib.csrc.pointnet2.pointnet2_utils")
        radius, nsample, npoint = 0.35, 8, 32
        rng = np.random.RandomState(17)
        for _ in range(20):
            pts = (rng.randn(1, 160, 3) * 0.4).astype(np.float32)
            d = np.sqrt(
                ((pts[0][:, None] - pts[0][None]) ** 2).sum(-1)
            )
            if np.abs(d - radius).min() > 1e-4:
                break
        else:
            pytest.skip("no margin-clean cloud found")
        want_fps = stub.furthest_point_sample(th.from_numpy(pts), npoint)
        got_fps = pn2.furthest_point_sample(jnp.asarray(pts), npoint)
        np.testing.assert_array_equal(
            np.asarray(got_fps), want_fps.numpy()
        )
        centers = pts[:, :npoint]
        want_bq = stub.ball_query(
            radius, nsample, th.from_numpy(pts), th.from_numpy(centers)
        )
        got_bq = pn2.ball_query(
            radius, nsample, jnp.asarray(pts), jnp.asarray(centers)
        )
        np.testing.assert_array_equal(np.asarray(got_bq), want_bq.numpy())
        want_d, want_i = stub.three_nn(
            th.from_numpy(centers), th.from_numpy(pts)
        )
        got_d, got_i = pn2.three_nn(
            jnp.asarray(centers), jnp.asarray(pts)
        )
        np.testing.assert_array_equal(np.asarray(got_i), want_i.numpy())
        np.testing.assert_allclose(
            np.asarray(got_d), want_d.numpy(), rtol=1e-5, atol=1e-6
        )


class TestNHRCheckpointImport:
    def test_convert_nhr_param_tree_matches_model(self):
        """The NHR .pth import (compat.convert_nhr) must produce a param
        tree our NHR accepts leaf-for-leaf: the reference Network's
        learnable tensors are exactly the pointnet + render.unet +
        pcpr_parameters.default_features subtrees (PCPR's splatter has
        no weights), and our model is built to the same UNet widths and
        21-channel fuse. The full NHR forward cannot be golden (PCPR is
        external CUDA); the UNet and pointnet2 MATH are pinned by the
        golden tests above on identical weights."""
        ref_oracle.install()
        torch.manual_seed(109)
        # assemble the reference state dict from its real submodules
        # (lib/networks/nhr/nhr.py:13-20 constructs exactly these)
        unet_mod = ref_oracle.load("lib.networks.nhr.unet_model")
        pn_mod = ref_oracle.load("lib.networks.pointnet2.pointnet2_msg")
        ref_unet = unet_mod.UNet(
            21, 3, [32, 64, 180, 450, 450, 180, 64, 32, 26],
            use_maks=True, no_modified=False,
        )
        ref_pn = pn_mod.get_model(0, 18)
        state = {}
        for k, v in ref_unet.state_dict().items():
            state[f"render.unet.{k}"] = v.detach().numpy()
        for k, v in ref_pn.state_dict().items():
            state[f"pointnet.{k}"] = v.detach().numpy()
        state["pcpr_parameters.default_features"] = (
            np.random.RandomState(0).randn(18, 1).astype(np.float32)
        )
        params = jax.tree_util.tree_map(
            jnp.asarray, torch_import.convert_nhr(state)
        )

        from animatable_nerf_tpu.baselines import NHR

        rng = np.random.RandomState(23)
        V, H, W = 128, 64, 64
        tverts = (rng.randn(V, 3) * 0.3).astype(np.float32)
        bounds = np.stack([tverts.min(0) - 0.1, tverts.max(0) + 0.1])
        A = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
        batch = {
            "tpose": jnp.asarray(tverts),
            "tbw": jnp.asarray(rng.rand(8, 8, 8, 25).astype(np.float32)),
            "tbounds": jnp.asarray(bounds.astype(np.float32)),
            "big_A": jnp.asarray(A), "A": jnp.asarray(A),
            "R": jnp.eye(3), "Th": jnp.zeros((1, 3)),
            "K": jnp.asarray(np.array(
                [[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32
            )),
            "RT": jnp.asarray(np.concatenate(
                [np.eye(3, dtype=np.float32),
                 np.array([[0], [0], [2.0]], np.float32)], axis=1,
            )),
        }
        model = NHR(H=H, W=W, feature_dim=18, frozen_stats=True)
        init = model.init(jax.random.PRNGKey(0), batch)
        # leaf-for-leaf structural match
        got_paths = {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_leaves_with_path(params)
        }
        want_paths = {
            "/".join(str(k.key) for k in path): leaf.shape
            for path, leaf in jax.tree_util.tree_leaves_with_path(init)
        }
        assert got_paths == want_paths
        # and the converted params actually drive the forward
        out = model.apply(params, batch)
        assert np.isfinite(np.asarray(out["rgb_map"])).all()
