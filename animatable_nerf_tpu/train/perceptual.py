"""The reference's `lib/losses` package in pure JAX.

The reference ships four loss components (lib/losses/__init__.py):

  * `Perceptual_loss` (lib/losses/nhr_perceptual_loss.py:58-90) — the
    loss the shipped NHR/NT trainers actually use
    (lib/train/trainers/nhr.py:6,16 and nt.py:6,17): L1 between VGG19
    relu1_2/relu2_2 feature maps of pred and target (plus the same on a
    4th mask channel repeated to 3ch) and a plain image L1.
  * `VGGPerceptualLoss` (lib/losses/perceptual_loss.py:25-106, gated by
    cfg.train.use_vgg) — grayscale-normalized custom VGG16 with taps at
    conv{1..5}_2_relu, per-tap MSE with optional mask weighting and
    optional Gram-matrix (style) form.
  * `SSIMLoss` (lib/losses/ssim.py:38-68) — 11x11 Gaussian-window SSIM,
    loss = weight * clamp(1 - mean(ssim_map), 0, 1).
  * `GANLoss` + `NLayerDiscriminator` (lib/losses/discriminator.py) —
    LSGAN/BCE objective and the pix2pixHD PatchGAN discriminator.

No pretrained VGG weights are bundled (they derive from ImageNet /
CelebA checkpoints the repo may not ship); convert user-supplied torch
weights once with `tools/convert_vgg_weights.py` and point
`train.vgg_weights` at the resulting .npz — BaselineTrainer then runs
the exact reference NHR/NT objective instead of its documented
multi-scale stand-in.

Everything is NHWC with HWIO conv kernels (XLA's preferred layout); the
converter transposes torch's OIHW.
"""

from __future__ import annotations

from math import exp

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn
from jax import lax


def _conv2d(x, w, b=None, stride: int = 1, pad: int = 0, groups: int = 1):
    """NHWC conv with HWIO kernel and symmetric zero padding (the torch
    Conv2d default padding mode)."""
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=groups,
    )
    return y if b is None else y + b


def _maxpool2(x):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


# ---------------------------------------------------------------------------
# Perceptual_loss (nhr_perceptual_loss.py) — VGG19 head, taps relu1_2/relu2_2
# ---------------------------------------------------------------------------

# (in_ch, out_ch) of the four convs of torchvision vgg19.features[0..8]
# (LossNetwork stops after module '8' — nhr_perceptual_loss.py:47-55)
VGG19_HEAD_CONVS = ((3, 64), (64, 64), (64, 128), (128, 128))


def vgg19_head_taps(params, x):
    """The reference LossNetwork (nhr_perceptual_loss.py:26-55): run the
    first 9 torchvision-vgg19 feature modules on raw (unnormalized) x and
    return the relu1_2 / relu2_2 activations.

    x: (N, H, W, 3) NHWC. params: conv{0..3}_w HWIO + conv{0..3}_b.
    """
    x = jax.nn.relu(_conv2d(x, params["conv0_w"], params["conv0_b"], pad=1))
    x = jax.nn.relu(_conv2d(x, params["conv1_w"], params["conv1_b"], pad=1))
    relu1 = x
    x = _maxpool2(x)
    x = jax.nn.relu(_conv2d(x, params["conv2_w"], params["conv2_b"], pad=1))
    x = jax.nn.relu(_conv2d(x, params["conv3_w"], params["conv3_b"], pad=1))
    return relu1, x


def perceptual_loss(params, x, target):
    """Perceptual_loss.forward (nhr_perceptual_loss.py:70-90).

    x, target: (N, H, W, C) NHWC with C == 3 (rgb) or C == 4 (rgb +
    mask, the NHR/NT trainer stacking — nhr.py:27-29). Returns
    (feature_loss, l1_loss); the trainers sum the two (nhr.py:30-31).
    """
    xf = vgg19_head_taps(params, x[..., 0:3])
    tf = vgg19_head_taps(params, target[..., 0:3])
    feature_loss = (
        jnp.mean(jnp.abs(xf[0] - tf[0])) + jnp.mean(jnp.abs(xf[1] - tf[1]))
    ) / 2.0
    if x.shape[-1] > 3:
        xm = jnp.repeat(x[..., 3:4], 3, axis=-1)
        tm = jnp.repeat(target[..., 3:4], 3, axis=-1)
        xmf = vgg19_head_taps(params, xm)
        tmf = vgg19_head_taps(params, tm)
        feature_loss = feature_loss + (
            jnp.mean(jnp.abs(xmf[0] - tmf[0]))
            + jnp.mean(jnp.abs(xmf[1] - tmf[1]))
        ) / 2.0
    l1 = jnp.mean(jnp.abs(x - target))
    return feature_loss, l1


def random_vgg19_head(seed: int = 0) -> dict:
    """Random params in the production structure (tests / smoke)."""
    r = np.random.RandomState(seed)
    params = {}
    for i, (cin, cout) in enumerate(VGG19_HEAD_CONVS):
        params[f"conv{i}_w"] = jnp.asarray(
            r.randn(3, 3, cin, cout).astype(np.float32)
            * np.sqrt(2.0 / (9 * cin))
        )
        params[f"conv{i}_b"] = jnp.asarray(
            r.randn(cout).astype(np.float32) * 0.01
        )
    return params


def load_vgg_npz(path: str) -> dict:
    """Load a converted .npz (tools/convert_vgg_weights.py)."""
    z = np.load(path)
    return {k: jnp.asarray(z[k]) for k in z.files if k != "arch"}


# ---------------------------------------------------------------------------
# VGGPerceptualLoss (perceptual_loss.py) — grayscale VGG16, 5 block taps
# ---------------------------------------------------------------------------

# channel plan of the reference's custom vgg16 (cfg 'D', in_channels=1 —
# vgg.py:70-99): convs per block, tap after the SECOND conv's relu
VGG16_GRAY_BLOCKS = ((64, 64), (128, 128), (256, 256, 256),
                     (512, 512, 512), (512, 512, 512))


def vgg16_gray_taps(params, img):
    """Feature taps of VGGPerceptualLoss.get_feat
    (perceptual_loss.py:57-81): normalize to grayscale
    ((mean_c(img) - 114.451) / 255 — images in [0, 255]), run the
    1-channel VGG16 and tap conv{1..5}_2_relu.

    img: (N, H, W, C). Returns list of 5 NHWC activations. Layers after
    the last tap never feed a tap and are skipped (identical values).
    """
    x = (jnp.mean(img, axis=-1, keepdims=True) - 114.451) / 255.0
    taps = []
    ci = 0
    for bi, widths in enumerate(VGG16_GRAY_BLOCKS):
        for wi, _ in enumerate(widths):
            x = jax.nn.relu(
                _conv2d(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"],
                        pad=1)
            )
            ci += 1
            if wi == 1:
                taps.append(x)
                if bi == len(VGG16_GRAY_BLOCKS) - 1:
                    return taps
        x = _maxpool2(x)
    return taps


def _gram(f):
    """Gram matrix per image: (N,H,W,C) -> (N,C,C) / (C*H*W)
    (perceptual_loss.py:58-67)."""
    n, h, w, c = f.shape
    m = f.reshape(n, h * w, c)
    return jnp.einsum("npc,npd->ncd", m, m) / (c * h * w)


def vgg_perceptual_loss(params, pred, gt, mask=None, layer_weights=None,
                        is_gram: bool = False):
    """VGGPerceptualLoss.forward (perceptual_loss.py:83-106): per-tap MSE
    (optionally mask-weighted with a bilinear-resized mask, or on Gram
    matrices for style), scaled by per-layer weights. Returns the list of
    5 per-tap losses (the reference returns loss_list).

    pred, gt: (N, H, W, C) in [0, 255]. mask: (N, H, W, 1) or None.
    """
    if layer_weights is None:
        layer_weights = (1.0,) * 5
    if is_gram:
        # keep the reference's call surface: its forward ASSERTS a mask
        # is passed with is_gram and then discards it
        # (perceptual_loss.py:95-97) — reference-style call sites pass
        # one, so accept and ignore it rather than raising
        mask = None
    pf = vgg16_gray_taps(params, pred)
    gf = vgg16_gray_taps(params, gt)
    losses = []
    for w, p, g in zip(layer_weights, pf, gf):
        if is_gram:
            p, g = _gram(p), _gram(g)
        d = (p - g) ** 2
        if mask is not None:
            m = jax.image.resize(
                mask, (mask.shape[0], p.shape[1], p.shape[2], 1), "bilinear"
            )
            d = d * m
        losses.append(jnp.mean(d) * w)
    return losses


def random_vgg16_gray(seed: int = 0) -> dict:
    r = np.random.RandomState(seed)
    params = {}
    cin, ci = 1, 0
    for widths in VGG16_GRAY_BLOCKS:
        for cout in widths:
            params[f"conv{ci}_w"] = jnp.asarray(
                r.randn(3, 3, cin, cout).astype(np.float32)
                * np.sqrt(2.0 / (9 * cin))
            )
            params[f"conv{ci}_b"] = jnp.asarray(
                r.randn(cout).astype(np.float32) * 0.01
            )
            cin = cout
            ci += 1
    return params


# ---------------------------------------------------------------------------
# SSIMLoss (ssim.py)
# ---------------------------------------------------------------------------

def gaussian_window(window_size: int = 11, sigma: float = 1.5):
    """1D Gaussian, normalized (ssim.py:5-7)."""
    g = np.array(
        [exp(-((i - window_size // 2) ** 2) / (2.0 * sigma**2))
         for i in range(window_size)],
        np.float32,
    )
    return g / g.sum()


def ssim_map(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """_ssim (ssim.py:15-35): depthwise Gaussian-window SSIM map with
    zero 'same' padding (torch conv2d padding=k//2, groups=C).

    img1, img2: (N, H, W, C) NHWC.
    """
    c = img1.shape[-1]
    g1 = gaussian_window(window_size, sigma)
    w2d = np.outer(g1, g1).astype(np.float32)
    # depthwise HWIO kernel: (k, k, 1, C) with feature_group_count=C
    w = jnp.asarray(np.tile(w2d[:, :, None, None], (1, 1, 1, c)))
    pad = window_size // 2

    def f(x):
        return _conv2d(x, w, stride=1, pad=pad, groups=c)

    mu1, mu2 = f(img1), f(img2)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = f(img1 * img1) - mu1_sq
    sigma2_sq = f(img2 * img2) - mu2_sq
    sigma12 = f(img1 * img2) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    return ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )


def ssim_loss(img1, img2, window_size: int = 11, loss_weight: float = 1.0):
    """SSIMLoss.forward with reduction='mean' (ssim.py:53-68):
    weight * clamp(1 - mean(ssim_map), 0, 1)."""
    v = jnp.mean(ssim_map(img1, img2, window_size))
    return loss_weight * jnp.clip(1.0 - v, 0.0, 1.0)


# ---------------------------------------------------------------------------
# GANLoss + NLayerDiscriminator (discriminator.py)
# ---------------------------------------------------------------------------

def gan_loss(pred, target_is_real: bool, use_lsgan: bool = True,
             real_label: float = 1.0, fake_label: float = 0.0):
    """GANLoss.__call__ (discriminator.py:39-49): MSE (LSGAN) or BCE of
    the prediction against a constant real/fake label. Accepts an array,
    a list of per-scale outputs (last element scored), or a list of such
    lists (multi-scale discriminators, summed)."""
    if isinstance(pred, (list, tuple)) and isinstance(
        pred[0], (list, tuple)
    ):
        return sum(
            gan_loss(p, target_is_real, use_lsgan, real_label, fake_label)
            for p in pred
        )
    if isinstance(pred, (list, tuple)):
        pred = pred[-1]
    t = real_label if target_is_real else fake_label
    if use_lsgan:
        return jnp.mean((pred - t) ** 2)
    eps = 1e-12
    return -jnp.mean(
        t * jnp.log(pred + eps) + (1.0 - t) * jnp.log(1.0 - pred + eps)
    )


class NLayerDiscriminator(nn.Module):
    """pix2pixHD PatchGAN (discriminator.py:52-101): 4x4 convs (pad 2),
    n_layers stride-2 stages doubling width (cap 512), InstanceNorm
    (GroupNorm with one group per channel, no affine — torch
    InstanceNorm2d default) + LeakyReLU(0.2), then a stride-1 stage and a
    1-channel head. NHWC.

    get_interm_feat returns every stage's activation (discriminator
    feature-matching losses); use_sigmoid for the BCE objective.
    """

    input_nc: int = 3
    ndf: int = 64
    n_layers: int = 3
    use_sigmoid: bool = False
    get_interm_feat: bool = False

    @nn.compact
    def __call__(self, x):
        feats = []

        def stage(x, nf, stride, norm, idx):
            x = nn.Conv(
                nf, (4, 4), strides=(stride, stride),
                padding=[(2, 2), (2, 2)], name=f"conv{idx}",
            )(x)
            if norm:
                x = nn.GroupNorm(
                    num_groups=nf, epsilon=1e-5, use_bias=False,
                    use_scale=False, name=f"in{idx}",
                )(x)
            return nn.leaky_relu(x, 0.2)

        nf = self.ndf
        x = stage(x, nf, 2, False, 0)
        feats.append(x)
        for n in range(1, self.n_layers):
            nf = min(nf * 2, 512)
            x = stage(x, nf, 2, True, n)
            feats.append(x)
        nf = min(nf * 2, 512)
        x = stage(x, nf, 1, True, self.n_layers)
        feats.append(x)
        x = nn.Conv(
            1, (4, 4), strides=(1, 1), padding=[(2, 2), (2, 2)],
            name=f"conv{self.n_layers + 1}",
        )(x)
        if self.use_sigmoid and not self.get_interm_feat:
            # the reference's getIntermFeat path iterates only
            # n_layers+2 stages, so its sigmoid module is SKIPPED there
            # (discriminator.py:93-99) — match it
            x = jax.nn.sigmoid(x)
        feats.append(x)
        return feats if self.get_interm_feat else x
