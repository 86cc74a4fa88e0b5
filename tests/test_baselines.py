"""Baseline model families (NHR / NT): shape, finiteness and gradient
tests on tiny configurations (SURVEY.md §2.3 NHR/NT rows)."""

import numpy as np
import jax
import jax.numpy as jnp

from animatable_nerf_tpu.baselines import PointNet2MSG, UNet, NHR, NT
from animatable_nerf_tpu.core.grid import grid_bilerp

TINY_PN = dict(
    npoints=(32, 16, 8, 4),
    radii=((0.2, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0)),
    nsamples=((4, 8),) * 4,
    mlps=(
        ((8, 8), (8, 8)),
        ((8, 8), (8, 8)),
        ((16, 16), (16, 16)),
        ((16, 16), (16, 16)),
    ),
    fp_widths=(None, (16, 16), (32, 32), (32, 32)),
)
TINY_UNET = (4, 4, 8, 8, 8, 8, 8, 4, 4)


class TestPointNet2MSG:
    def test_forward_shapes_and_grad(self, rng):
        net = PointNet2MSG(out_dim=8, **TINY_PN)
        xyz = jnp.asarray(rng.randn(1, 128, 3).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), xyz)
        out = net.apply(params, xyz)
        assert out.shape == (1, 128, 8)
        assert np.isfinite(np.asarray(out)).all()

        def loss(p):
            return jnp.sum(net.apply(p, xyz) ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        assert any(float(jnp.abs(l).sum()) > 0 for l in leaves)


class TestUNet:
    def test_max_pool_matches_reduce_window(self, rng):
        """The shifted-slice pool (TPU space-to-batch workaround,
        unet.py _max_pool) must equal flax's reduce_window pool with
        VALID padding — torch nn.MaxPool2d(2, stride=1) semantics
        (output (H-1, W-1), no implicit padding; pinned end-to-end by
        the golden UNet test)."""
        from flax import linen as nn
        from animatable_nerf_tpu.baselines.unet import _max_pool

        for H, W in ((32, 32), (17, 23), (8, 18)):
            for window in (2, 3, 4, 5):
                x = jnp.asarray(rng.randn(2, H, W, 5).astype(np.float32))
                ref = nn.max_pool(
                    x, (window, window), strides=(1, 1), padding="VALID"
                )
                got = _max_pool(x, window, 1)
                np.testing.assert_array_equal(
                    np.asarray(got), np.asarray(ref)
                )

    def test_forward_mask_channel(self, rng):
        net = UNet(n_classes=3, layer_widths=TINY_UNET, use_mask=True)
        x = jnp.asarray(rng.randn(1, 32, 32, 5).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == (1, 32, 32, 4)
        mask = np.asarray(out[..., 3])
        assert (mask >= 0).all() and (mask <= 1).all()

    def test_odd_sizes_align(self, rng):
        net = UNet(n_classes=3, layer_widths=TINY_UNET, use_mask=False)
        x = jnp.asarray(rng.randn(1, 30, 26, 4).astype(np.float32))
        params = net.init(jax.random.PRNGKey(0), x)
        out = net.apply(params, x)
        assert out.shape == (1, 30, 26, 3)


class TestGridBilerp:
    def test_corners_and_center(self, rng):
        img = jnp.asarray(rng.rand(5, 7, 3).astype(np.float32))
        uv = jnp.asarray(
            np.array([[0.0, 0.0], [1.0, 1.0], [0.5, 0.5]], np.float32)
        )
        out = grid_bilerp(img, uv)
        np.testing.assert_allclose(out[0], img[0, 0], rtol=1e-6)
        np.testing.assert_allclose(out[1], img[4, 6], rtol=1e-6)
        # center of a (5, 7) grid: exact pixel (2, 3)
        np.testing.assert_allclose(out[2], img[2, 3], rtol=1e-6)


def _nhr_batch(rng, V=64, H=32, W=32, grid=(8, 8, 8)):
    tverts = (rng.randn(V, 3) * 0.3).astype(np.float32)
    bounds = np.stack([tverts.min(0) - 0.1, tverts.max(0) + 0.1])
    A = np.tile(np.eye(4, dtype=np.float32), (24, 1, 1))
    K = np.array([[W, 0, W / 2], [0, W, H / 2], [0, 0, 1]], np.float32)
    RT = np.concatenate(
        [np.eye(3, dtype=np.float32), np.array([[0], [0], [2.0]], np.float32)],
        axis=1,
    )
    bw = rng.rand(*grid, 25).astype(np.float32)
    return {
        "tpose": jnp.asarray(tverts),
        "tbw": jnp.asarray(bw),
        "tbounds": jnp.asarray(bounds.astype(np.float32)),
        "big_A": jnp.asarray(A),
        "A": jnp.asarray(A),
        "R": jnp.eye(3),
        "Th": jnp.zeros((1, 3)),
        "K": jnp.asarray(K),
        "RT": jnp.asarray(RT),
    }


class TestNHR:
    def test_forward_and_grad(self, rng):
        H = W = 32
        model = NHR(
            H=H, W=W, feature_dim=8,
            pointnet_kwargs=TINY_PN, unet_widths=TINY_UNET,
        )
        batch = _nhr_batch(rng)
        params = model.init(jax.random.PRNGKey(0), batch)
        out = model.apply(params, batch)
        assert out["rgb_map"].shape == (H, W, 3)
        assert out["mask"].shape == (H, W)
        assert np.isfinite(np.asarray(out["rgb_map"])).all()

        def loss(p):
            return jnp.mean(model.apply(p, batch)["rgb_map"] ** 2)

        g = jax.grad(loss)(params)
        leaves = jax.tree_util.tree_leaves(g)
        assert all(np.isfinite(np.asarray(l)).all() for l in leaves)
        # the learned default (miss-fill) features must receive gradient
        dg = g["params"]["default_features"]
        assert float(jnp.abs(dg).sum()) > 0


class TestNT:
    def test_forward_and_grad(self, rng):
        H = W = 32
        net = NT(size=64, feature_dim=4, unet_widths=TINY_UNET)
        batch = {
            "uv": jnp.asarray(rng.rand(H, W, 2).astype(np.float32)),
            "uv_msk": jnp.asarray(
                (rng.rand(H, W) > 0.3).astype(np.float32)
            ),
        }
        params = net.init(jax.random.PRNGKey(0), batch)
        out = net.apply(params, batch)
        assert out["rgb_map"].shape == (H, W, 3)

        def loss(p):
            return jnp.mean(net.apply(p, batch)["rgb_map"] ** 2)

        g = jax.grad(loss)(params)
        tex_g = g["params"]["texture"]["layer1"]
        assert float(jnp.abs(tex_g).sum()) > 0
