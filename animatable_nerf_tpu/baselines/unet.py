"""Gated-conv UNet refiner with anti-aliased (blur-pool) downsampling.

Mirrors the NHR/NT refiner (lib/networks/nhr/unet_model.py:8-66,
unet_parts.py, models_lpf.py): 4 down / 4 up levels with gated 3x3
convs, low-pass-filtered stride-2 downsampling (the models_lpf
"Making Convolutions Shift-Invariant Again" trick), bilinear upsampling
with skip concat, and an output head producing n_classes channels plus a
sigmoid mask channel when `use_mask`.

TPU notes: channels-last NHWC (XLA's native conv layout), GroupNorm in
place of BatchNorm (stateless under pjit), the blur filter is a fixed
depthwise conv.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class GatedConv(nn.Module):
    """sigmoid(conv_gate(x)) * conv(x)  (unet_parts.py:9-23)."""

    features: int
    kernel: int = 3

    @nn.compact
    def __call__(self, x):
        k = (self.kernel, self.kernel)
        feat = nn.Conv(self.features, k, padding="SAME", name="conv")(x)
        gate = nn.Conv(self.features, k, padding="SAME", name="gate")(x)
        return jax.nn.sigmoid(gate) * feat


class DoubleConv(nn.Module):
    """(gated conv -> norm -> relu) x 2  (unet_parts.py:26-48)."""

    features: int

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = GatedConv(self.features, name=f"gc{i}")(x)
            groups = next(
                g for g in (8, 4, 2, 1) if self.features % g == 0
            )
            x = nn.GroupNorm(num_groups=groups, name=f"gn{i}")(x)
            x = nn.relu(x)
        return x


def blur_pool(x, filt_size: int = 3, stride: int = 2):
    """Anti-aliased downsample: fixed binomial low-pass depthwise conv
    with stride (models_lpf.Downsample, unet_parts.py:71-73)."""
    a = {1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0],
         5: [1.0, 4.0, 6.0, 4.0, 1.0]}[filt_size]
    f1 = np.asarray(a, np.float32)
    f2 = np.outer(f1, f1)
    f2 = f2 / f2.sum()
    C = x.shape[-1]
    kern = jnp.asarray(f2)[:, :, None, None] * jnp.ones((1, 1, 1, C))
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(stride, stride),
        padding=[(filt_size // 2, filt_size // 2)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _max_pool(x, window: int, stride: int):
    """Stride-1 SAME max pool as an elementwise max of shifted slices.

    Equivalent to nn.max_pool(..., padding="SAME") but avoids emitting a
    reduce_window: XLA:TPU's space-to-batch pass CHECK-fails
    (space_to_batch_converter.cc:4190) when a reduce_window feeds the
    stride-2 depthwise blur conv at batch 1 — the exact
    maxpool->blurpool chain of this UNet (measured on v5e).
    """
    assert stride == 1, "only the stride-1 anti-aliasing pool is used"
    B, H, W, C = x.shape
    # SAME at stride 1: total pad window-1, split low = total // 2
    # (XLA convention; window 2 -> 0 low / 1 high, window 3 -> 1 / 1)
    pl = (window - 1) // 2
    ph = window - 1 - pl
    xp = jnp.pad(
        x, ((0, 0), (pl, ph), (pl, ph), (0, 0)),
        constant_values=-jnp.inf,
    )
    out = None
    for di in range(window):
        for dj in range(window):
            sl = xp[:, di:di + H, dj:dj + W]
            out = sl if out is None else jnp.maximum(out, sl)
    return out


class Down(nn.Module):
    """maxpool(stride 1) -> blurpool(stride 2) -> double conv
    (unet_parts.py:62-79, modified path)."""

    features: int

    @nn.compact
    def __call__(self, x):
        x = _max_pool(x, 2, 1)
        x = blur_pool(x)
        return DoubleConv(self.features, name="conv")(x)


class Up(nn.Module):
    """bilinear 2x upsample -> pad-align -> skip concat -> double conv
    (unet_parts.py:82-116)."""

    features: int

    @nn.compact
    def __call__(self, x, skip):
        B, H, W, C = x.shape
        x = jax.image.resize(x, (B, H * 2, W * 2, C), method="bilinear")
        sh, sw = skip.shape[1], skip.shape[2]
        x = x[:, :sh, :sw]
        if x.shape[1] < sh or x.shape[2] < sw:
            x = jnp.pad(
                x, ((0, 0), (0, sh - x.shape[1]), (0, sw - x.shape[2]),
                    (0, 0))
            )
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(self.features, name="conv")(x)


class UNet(nn.Module):
    """4-down/4-up gated UNet (unet_model.py:8-80).

    `layer_widths` follows the reference's 9-entry spec
    [inc, d1, d2, d3, d4, u1, u2, u3, u4]; output has `n_classes`
    channels (+1 sigmoid mask channel when use_mask).
    """

    n_classes: int = 3
    layer_widths: Sequence[int] = (64, 128, 256, 512, 512, 256, 128, 64, 32)
    use_mask: bool = True

    @nn.compact
    def __call__(self, x):
        lw = self.layer_widths
        x1 = DoubleConv(lw[0], name="inc")(x)
        x2 = Down(lw[1], name="down1")(x1)
        x3 = Down(lw[2], name="down2")(x2)
        x4 = Down(lw[3], name="down3")(x3)
        x5 = Down(lw[4], name="down4")(x4)
        h = Up(lw[5], name="up1")(x5, x4)
        h = Up(lw[6], name="up2")(h, x3)
        h = Up(lw[7], name="up3")(h, x2)
        h = Up(lw[8], name="up4")(h, x1)
        out_ch = self.n_classes + (1 if self.use_mask else 0)
        out = nn.Conv(out_ch, (1, 1), name="outc")(h)
        if self.use_mask:
            rgb, mask = out[..., : self.n_classes], out[..., self.n_classes:]
            out = jnp.concatenate([rgb, jax.nn.sigmoid(mask)], axis=-1)
        return out
