"""Torch-parity tests for train/perceptual.py — the reference's
lib/losses package (nhr_perceptual_loss / perceptual_loss / ssim /
discriminator) rebuilt in JAX.

Each test builds the torch module in-test following the reference
architecture (no reference code imported), runs both sides with the SAME
weights, and asserts agreement — the same oracle style as
tests/test_parity_torch.py.
"""

import numpy as np
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402
import torch.nn.functional as tF  # noqa: E402

from animatable_nerf_tpu.train.perceptual import (  # noqa: E402
    NLayerDiscriminator,
    VGG16_GRAY_BLOCKS,
    gan_loss,
    perceptual_loss,
    random_vgg16_gray,
    random_vgg19_head,
    ssim_loss,
    ssim_map,
    vgg16_gray_taps,
    vgg19_head_taps,
    vgg_perceptual_loss,
)


def _hwio_to_torch_conv(conv, w, b):
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(np.transpose(np.asarray(w), (3, 2, 0, 1))))
        conv.bias.copy_(torch.from_numpy(np.asarray(b)))


def _torch_vgg19_head(params):
    """torchvision vgg19.features[0..8] with our converted weights
    (nhr_perceptual_loss.py LossNetwork's layer_name_mapping {3,8})."""
    chans = [(3, 64), (64, 64), (64, 128), (128, 128)]
    convs = [tnn.Conv2d(i, o, 3, padding=1) for i, o in chans]
    for ci, conv in enumerate(convs):
        _hwio_to_torch_conv(conv, params[f"conv{ci}_w"], params[f"conv{ci}_b"])
    layers = [
        convs[0], tnn.ReLU(), convs[1], tnn.ReLU(),  # idx 0-3, tap at 3
        tnn.MaxPool2d(2, 2),                         # idx 4
        convs[2], tnn.ReLU(), convs[3], tnn.ReLU(),  # idx 5-8, tap at 8
    ]
    return tnn.Sequential(*layers)


def test_perceptual_loss_torch_parity():
    """Full Perceptual_loss.forward semantics on a 4-channel (rgb+mask)
    stack (nhr_perceptual_loss.py:70-90, as driven by nhr.py:25-31)."""
    r = np.random.RandomState(0)
    params = random_vgg19_head(0)
    net = _torch_vgg19_head(params)

    x = r.rand(2, 24, 20, 4).astype(np.float32)
    t = r.rand(2, 24, 20, 4).astype(np.float32)

    def torch_taps(img_nhwc3):
        h = torch.from_numpy(np.transpose(img_nhwc3, (0, 3, 1, 2)))
        taps = []
        for i, m in enumerate(net):
            h = m(h)
            if i in (3, 8):
                taps.append(h)
        return taps

    with torch.no_grad():
        xf = torch_taps(x[..., :3])
        tf = torch_taps(t[..., :3])
        feat = (
            tF.l1_loss(xf[0], tf[0]) + tF.l1_loss(xf[1], tf[1])
        ) / 2.0
        xm = np.repeat(x[..., 3:4], 3, axis=-1)
        tm = np.repeat(t[..., 3:4], 3, axis=-1)
        xmf = torch_taps(xm)
        tmf = torch_taps(tm)
        feat = feat + (
            tF.l1_loss(xmf[0], tmf[0]) + tF.l1_loss(xmf[1], tmf[1])
        ) / 2.0
        l1 = tF.l1_loss(torch.from_numpy(x), torch.from_numpy(t))

    feat_j, l1_j = perceptual_loss(params, jnp.asarray(x), jnp.asarray(t))
    np.testing.assert_allclose(float(feat_j), float(feat), rtol=2e-4, atol=1e-5)
    np.testing.assert_allclose(float(l1_j), float(l1), rtol=1e-5, atol=1e-6)


def test_vgg19_head_taps_rgb_only_shapes():
    params = random_vgg19_head(1)
    t1, t2 = vgg19_head_taps(params, jnp.zeros((1, 16, 16, 3)))
    assert t1.shape == (1, 16, 16, 64)
    assert t2.shape == (1, 8, 8, 128)


def test_ssim_loss_torch_parity():
    """ssim.py _ssim / SSIMLoss: Gaussian depthwise conv (padding k//2),
    per-formula map, loss = clamp(1 - mean, 0, 1)."""
    r = np.random.RandomState(1)
    a = r.rand(2, 20, 18, 3).astype(np.float32)
    b = (a + 0.1 * r.randn(2, 20, 18, 3)).astype(np.float32)

    # torch oracle (ssim.py:5-35)
    win = 11
    g = torch.tensor(
        [np.exp(-((i - win // 2) ** 2) / (2 * 1.5**2)) for i in range(win)],
        dtype=torch.float32,
    )
    g = (g / g.sum()).unsqueeze(1)
    w2 = g.mm(g.t()).unsqueeze(0).unsqueeze(0).expand(3, 1, win, win).contiguous()
    ta = torch.from_numpy(np.transpose(a, (0, 3, 1, 2)))
    tb = torch.from_numpy(np.transpose(b, (0, 3, 1, 2)))

    def f(x):
        return tF.conv2d(x, w2, padding=win // 2, groups=3)

    mu1, mu2 = f(ta), f(tb)
    s1 = f(ta * ta) - mu1**2
    s2 = f(tb * tb) - mu2**2
    s12 = f(ta * tb) - mu1 * mu2
    c1, c2 = 0.01**2, 0.03**2
    smap = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
        (mu1**2 + mu2**2 + c1) * (s1 + s2 + c2)
    )
    expected_loss = float((1 - smap.mean()).clamp(0, 1))

    smap_j = ssim_map(jnp.asarray(a), jnp.asarray(b))
    np.testing.assert_allclose(
        np.asarray(smap_j),
        np.transpose(smap.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        float(ssim_loss(jnp.asarray(a), jnp.asarray(b))),
        expected_loss, rtol=1e-4, atol=1e-6,
    )
    # identical images -> loss 0
    assert float(ssim_loss(jnp.asarray(a), jnp.asarray(a))) < 1e-5


def test_nlayer_discriminator_torch_parity():
    """PatchGAN parity (discriminator.py:52-101): 4x4/pad-2 convs,
    InstanceNorm (no affine), LeakyReLU 0.2."""
    r = np.random.RandomState(2)
    x = r.randn(1, 32, 32, 3).astype(np.float32)

    import jax

    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3)
    params = disc.init(jax.random.PRNGKey(0), jnp.asarray(x))

    # torch mirror with the SAME conv weights
    chans = [(3, 8, 2), (8, 16, 2), (16, 32, 2), (32, 64, 1), (64, 1, 1)]
    convs = []
    for i, (cin, cout, stride) in enumerate(chans):
        conv = tnn.Conv2d(cin, cout, 4, stride=stride, padding=2)
        p = params["params"][f"conv{i}"]
        _hwio_to_torch_conv(conv, p["kernel"], p["bias"])
        convs.append(conv)
    layers = [convs[0], tnn.LeakyReLU(0.2)]
    for i, c in enumerate(convs[1:-1], start=1):
        layers += [c, tnn.InstanceNorm2d(c.out_channels), tnn.LeakyReLU(0.2)]
    layers += [convs[-1]]
    net = tnn.Sequential(*layers)

    with torch.no_grad():
        expected = net(torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))).numpy()
    got = np.transpose(np.asarray(disc.apply(params, jnp.asarray(x))), (0, 3, 1, 2))
    np.testing.assert_allclose(got, expected, rtol=1e-3, atol=1e-4)


def test_nlayer_discriminator_interm_feats():
    import jax

    disc = NLayerDiscriminator(input_nc=3, ndf=8, n_layers=3,
                               get_interm_feat=True, use_sigmoid=True)
    x = jnp.zeros((1, 32, 32, 3))
    params = disc.init(jax.random.PRNGKey(0), x)
    feats = disc.apply(params, x)
    # n_layers + 2 stage outputs (discriminator.py:94-99 res[1:])
    assert len(feats) == 5
    out = np.asarray(feats[-1])
    assert out.min() >= 0.0 and out.max() <= 1.0  # sigmoid head


def test_gan_loss_values():
    pred = jnp.asarray(np.full((2, 4, 4, 1), 0.25, np.float32))
    # LSGAN: MSE against the constant label (discriminator.py:14-16,39-49)
    np.testing.assert_allclose(float(gan_loss(pred, True)), 0.5625, atol=1e-6)
    np.testing.assert_allclose(float(gan_loss(pred, False)), 0.0625, atol=1e-6)
    # list-of-list multi-scale form sums per-discriminator losses
    multi = [[pred], [pred]]
    np.testing.assert_allclose(float(gan_loss(multi, True)), 1.125, atol=1e-6)
    # BCE form (use_sigmoid discriminators)
    bce = float(gan_loss(pred, True, use_lsgan=False))
    np.testing.assert_allclose(bce, -np.log(0.25), rtol=1e-5)


def test_vgg16_gray_perceptual_torch_parity():
    """VGGPerceptualLoss (perceptual_loss.py:25-106): grayscale
    normalization, conv{i}_2_relu taps, per-tap MSE with mask weighting
    and the Gram (style) variant."""
    r = np.random.RandomState(3)
    params = random_vgg16_gray(0)
    pred = (r.rand(1, 32, 32, 3) * 255).astype(np.float32)
    gt = (r.rand(1, 32, 32, 3) * 255).astype(np.float32)

    # torch oracle: make_layers cfg 'D' with in_channels=1 (vgg.py:69-99)
    convs, cin, ci = [], 1, 0
    for widths in VGG16_GRAY_BLOCKS:
        block = []
        for cout in widths:
            conv = tnn.Conv2d(cin, cout, 3, padding=1)
            _hwio_to_torch_conv(conv, params[f"conv{ci}_w"], params[f"conv{ci}_b"])
            block.append(conv)
            cin = cout
            ci += 1
        convs.append(block)

    def torch_taps(img_nhwc):
        x = torch.from_numpy(np.transpose(img_nhwc, (0, 3, 1, 2)))
        x = (x.mean(dim=1, keepdim=True) - 114.451) / 255.0
        taps = []
        for bi, block in enumerate(convs):
            for wi, conv in enumerate(block):
                x = tF.relu(conv(x))
                if wi == 1:
                    taps.append(x)
            x = tF.max_pool2d(x, 2, 2)
        return taps

    with torch.no_grad():
        pf = torch_taps(pred)
        gf = torch_taps(gt)
        expected = [float(tF.mse_loss(p, g)) for p, g in zip(pf, gf)]

    got = [float(v) for v in vgg_perceptual_loss(params, jnp.asarray(pred),
                                                 jnp.asarray(gt))]
    np.testing.assert_allclose(got, expected, rtol=5e-4, atol=1e-6)

    # tap shapes follow the pool pyramid
    taps = vgg16_gray_taps(params, jnp.asarray(pred))
    assert [t.shape[1] for t in taps] == [32, 16, 8, 4, 2]

    # mask weighting multiplies the per-tap squared error by the
    # bilinear-resized mask before the mean (perceptual_loss.py:99-103)
    mask = np.zeros((1, 32, 32, 1), np.float32)
    masked = vgg_perceptual_loss(params, jnp.asarray(pred), jnp.asarray(gt),
                                 mask=jnp.asarray(mask))
    assert all(float(v) == 0.0 for v in masked)

    # gram variant returns finite per-tap style losses; mask is rejected
    style = vgg_perceptual_loss(params, jnp.asarray(pred), jnp.asarray(gt),
                                is_gram=True)
    assert all(np.isfinite(float(v)) for v in style)
    # reference-style call sites pass a mask with is_gram=True (its
    # forward asserts one is passed, then discards it —
    # perceptual_loss.py:95-97): accepted and ignored here
    style_masked = vgg_perceptual_loss(
        params, jnp.asarray(pred), jnp.asarray(gt),
        mask=jnp.asarray(mask), is_gram=True)
    for a, b in zip(style, style_masked):
        assert float(a) == float(b)


def test_convert_vgg_weights_roundtrip(tmp_path):
    """tools/convert_vgg_weights.py: torchvision-style vgg19 state_dict
    (features.{0,2,5,7}, OIHW) -> our npz (HWIO) reproduces the torch
    head's activations."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_vgg_weights as cvw

    r = np.random.RandomState(4)
    chans = [(3, 64), (64, 64), (64, 128), (128, 128)]
    sd = {}
    for mi, (cin, cout) in zip(cvw.VGG19_HEAD_IDX, chans):
        sd[f"features.{mi}.weight"] = torch.from_numpy(
            r.randn(cout, cin, 3, 3).astype(np.float32) * 0.1
        )
        sd[f"features.{mi}.bias"] = torch.from_numpy(
            r.randn(cout).astype(np.float32) * 0.01
        )
    pth = str(tmp_path / "vgg19.pth")
    torch.save(sd, pth)
    params = {
        k: jnp.asarray(v)
        for k, v in cvw.convert_vgg19_head(pth).items()
        if k != "arch"
    }

    x = r.rand(1, 16, 16, 3).astype(np.float32)
    convs = [tnn.Conv2d(i, o, 3, padding=1) for i, o in chans]
    for conv, mi in zip(convs, cvw.VGG19_HEAD_IDX):
        with torch.no_grad():
            conv.weight.copy_(sd[f"features.{mi}.weight"])
            conv.bias.copy_(sd[f"features.{mi}.bias"])
    h = torch.from_numpy(np.transpose(x, (0, 3, 1, 2)))
    with torch.no_grad():
        h = tF.relu(convs[0](h))
        t1 = tF.relu(convs[1](h))
        h = tF.max_pool2d(t1, 2, 2)
        h = tF.relu(convs[2](h))
        t2 = tF.relu(convs[3](h))

    j1, j2 = vgg19_head_taps(params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(j1), np.transpose(t1.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(j2), np.transpose(t2.numpy(), (0, 2, 3, 1)),
        rtol=1e-4, atol=1e-5,
    )


def test_convert_vgg16_gray_roundtrip(tmp_path):
    """convert_vgg16_gray: custom celeba-vgg16 state_dict (conv{i}_{j}
    naming under a module prefix — lib/losses/vgg.py make_layers) maps
    to our conv index order."""
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import convert_vgg_weights as cvw

    r = np.random.RandomState(5)
    sd, cin = {}, 1
    for bi, widths in enumerate(VGG16_GRAY_BLOCKS):
        for wi, cout in enumerate(widths):
            sd[f"vgg_layers.conv{bi + 1}_{wi + 1}.weight"] = torch.from_numpy(
                r.randn(cout, cin, 3, 3).astype(np.float32) * 0.05
            )
            sd[f"vgg_layers.conv{bi + 1}_{wi + 1}.bias"] = torch.from_numpy(
                r.randn(cout).astype(np.float32) * 0.01
            )
            cin = cout
    pth = str(tmp_path / "vgg16_gray.pth")
    torch.save(sd, pth)
    out = cvw.convert_vgg16_gray(pth)
    assert out["arch"] == "vgg16_gray"
    # 13 convs, first is 1-channel input, HWIO layout
    assert out["conv0_w"].shape == (3, 3, 1, 64)
    assert out["conv12_w"].shape == (3, 3, 512, 512)
    np.testing.assert_allclose(
        out["conv0_w"],
        np.transpose(sd["vgg_layers.conv1_1.weight"].numpy(), (2, 3, 1, 0)),
    )


def test_sdf_mask_alpha_cap():
    """sdf_mask_alpha_max caps the doubling ramp (round-4 schedule-
    regression mitigation); 0 keeps the exact reference schedule
    (crit.py:5-16)."""
    import jax.numpy as jnp

    from animatable_nerf_tpu.train.losses import sdf_mask_alpha

    steps = jnp.asarray([0, 10001, 20001, 30001, 50001])
    ref = [50.0, 100.0, 200.0, 400.0, 1600.0]
    for s, want in zip(steps, ref):
        assert float(sdf_mask_alpha(s)) == want
        assert float(sdf_mask_alpha(s, alpha_max=100.0)) == min(want, 100.0)
