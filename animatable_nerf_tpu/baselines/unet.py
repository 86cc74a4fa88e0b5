"""Gated-conv UNet refiner with anti-aliased (blur-pool) downsampling.

Mirrors the NHR/NT refiner (lib/networks/nhr/unet_model.py:8-66,
unet_parts.py, models_lpf.py): 4 down / 4 up levels with gated 3x3
convs, low-pass-filtered stride-2 downsampling (the models_lpf
"Making Convolutions Shift-Invariant Again" trick), bilinear upsampling
with skip concat, and an output head producing n_classes channels plus a
sigmoid mask channel when `use_mask`.

TPU notes: channels-last NHWC (XLA's native conv layout), the blur
filter is a fixed depthwise conv. Normalization (`norm` field) is
reference-faithful torch BatchNorm semantics by default (see
TorchBatchNorm); GroupNorm remains available as a stateless
TPU-idiomatic alternative (`norm="group"`).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class TorchBatchNorm(nn.Module):
    """torch nn.BatchNorm2d parity (unet_parts.py double_conv,
    pytorch_utils.BatchNorm2d).

    frozen=False normalizes with the CURRENT batch's stats over every
    axis but the channel — torch's train-mode forward, reproduced
    exactly at any batch size (golden tests run the torch net in train
    mode against this path). frozen=True applies the stored running
    stats — torch eval mode, used when serving torch-trained imports
    (compat/torch_import fills `mean`/`var` from running_mean/var).

    The running stats live as ordinary params so torch checkpoints
    import tensor-for-tensor; they are unused on the frozen=False path,
    so their gradients are identically zero and our own training leaves
    them at init. Jit-safe, no mutable collections; under multi-device
    DP each shard normalizes with its local batch like per-device
    (unsynced) torch DDP BatchNorm.
    """

    frozen: bool = False
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        C = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (C,))
        bias = self.param("bias", nn.initializers.zeros, (C,))
        rmean = self.param("mean", nn.initializers.zeros, (C,))
        rvar = self.param("var", nn.initializers.ones, (C,))
        if self.frozen:
            m, v = rmean, rvar
        else:
            axes = tuple(range(x.ndim - 1))
            m = jnp.mean(x, axis=axes)
            v = jnp.var(x, axis=axes)  # biased, like torch's normalizer
        return (x - m) * jax.lax.rsqrt(v + self.eps) * scale + bias


def make_norm(norm: str, features: int, name: str, frozen: bool = False):
    """`batch` (reference-faithful, default) or `group` (stateless
    TPU-idiomatic alternative; measured quality comparison in
    BASELINE.md)."""
    if norm == "batch":
        return TorchBatchNorm(frozen=frozen, name=name)
    if norm == "group":
        groups = next(g for g in (8, 4, 2, 1) if features % g == 0)
        return nn.GroupNorm(num_groups=groups, name=name)
    raise ValueError(f"unknown norm {norm!r}")


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
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, x):
        for i in range(2):
            x = GatedConv(self.features, name=f"gc{i}")(x)
            x = make_norm(
                self.norm, self.features, f"bn{i}", self.frozen_stats
            )(x)
            x = nn.relu(x)
        return x


def blur_pool(x, filt_size: int = 3, stride: int = 2):
    """Anti-aliased downsample: REFLECTION pad then fixed binomial
    low-pass depthwise conv with stride (models_lpf.Downsample,
    pad_type='reflect', unet_parts.py:71-73 — zero padding darkens the
    border ring; caught by the golden UNet test)."""
    a = {1: [1.0], 2: [1.0, 1.0], 3: [1.0, 2.0, 1.0],
         5: [1.0, 4.0, 6.0, 4.0, 1.0]}[filt_size]
    f1 = np.asarray(a, np.float32)
    f2 = np.outer(f1, f1)
    f2 = f2 / f2.sum()
    C = x.shape[-1]
    kern = jnp.asarray(f2)[:, :, None, None] * jnp.ones((1, 1, 1, C))
    pl = (filt_size - 1) // 2
    ph = filt_size - 1 - pl
    x = jnp.pad(x, ((0, 0), (pl, ph), (pl, ph), (0, 0)), mode="reflect")
    return jax.lax.conv_general_dilated(
        x, kern,
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


def _max_pool(x, window: int, stride: int):
    """Stride-1 VALID max pool (torch nn.MaxPool2d(2, stride=1): output
    is (H-1, W-1) — no implicit padding) as an elementwise max of
    shifted slices. Avoids emitting a reduce_window: XLA:TPU's
    space-to-batch pass CHECK-fails (space_to_batch_converter.cc:4190)
    when a reduce_window feeds the stride-2 depthwise blur conv at
    batch 1 — the exact maxpool->blurpool chain of this UNet (measured
    on v5e).
    """
    assert stride == 1, "only the stride-1 anti-aliasing pool is used"
    B, H, W, C = x.shape
    Ho, Wo = H - window + 1, W - window + 1
    out = None
    for di in range(window):
        for dj in range(window):
            sl = x[:, di:di + Ho, dj:dj + Wo]
            out = sl if out is None else jnp.maximum(out, sl)
    return out


def upsample2x_align_corners(x):
    """Exact torch nn.Upsample(scale_factor=2, mode='bilinear',
    align_corners=True): output node i samples input coordinate
    i*(H-1)/(2H-1); separable gather + lerp."""

    def axis_up(x, axis):
        n = x.shape[axis]
        if n == 1:
            return jnp.repeat(x, 2, axis=axis)
        pos = jnp.linspace(0.0, n - 1.0, 2 * n)
        lo = jnp.clip(jnp.floor(pos).astype(jnp.int32), 0, n - 2)
        frac = (pos - lo).astype(x.dtype)
        a = jnp.take(x, lo, axis=axis)
        b = jnp.take(x, lo + 1, axis=axis)
        shape = [1] * x.ndim
        shape[axis] = 2 * n
        frac = frac.reshape(shape)
        return a * (1.0 - frac) + b * frac

    return axis_up(axis_up(x, 1), 2)


class Down(nn.Module):
    """maxpool(stride 1) -> blurpool(stride 2) -> double conv
    (unet_parts.py:62-79, modified path)."""

    features: int
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, x):
        x = _max_pool(x, 2, 1)
        x = blur_pool(x)
        return DoubleConv(
            self.features, norm=self.norm, frozen_stats=self.frozen_stats,
            name="conv",
        )(x)


class Up(nn.Module):
    """bilinear 2x upsample -> pad-align -> skip concat -> double conv
    (unet_parts.py:82-116)."""

    features: int
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, x, skip):
        x = upsample2x_align_corners(x)
        # symmetric zero pad/crop onto the skip's spatial shape, low side
        # gets diff // 2 (unet_parts.py:98-106 F.pad split)
        sh, sw = skip.shape[1], skip.shape[2]
        dy, dx = sh - x.shape[1], sw - x.shape[2]
        if dy > 0 or dx > 0:
            x = jnp.pad(
                x,
                ((0, 0), (max(dy // 2, 0), max(dy - dy // 2, 0)),
                 (max(dx // 2, 0), max(dx - dx // 2, 0)), (0, 0)),
            )
        if dy < 0 or dx < 0:
            x = x[:, :sh, :sw]
        x = jnp.concatenate([skip, x], axis=-1)
        return DoubleConv(
            self.features, norm=self.norm, frozen_stats=self.frozen_stats,
            name="conv",
        )(x)


class UNet(nn.Module):
    """4-down/4-up gated UNet (unet_model.py:8-80).

    `layer_widths` follows the reference's 9-entry spec
    [inc, d1, d2, d3, d4, u1, u2, u3, u4]; output has `n_classes`
    channels (+1 sigmoid mask channel when use_mask).
    """

    n_classes: int = 3
    layer_widths: Sequence[int] = (64, 128, 256, 512, 512, 256, 128, 64, 32)
    use_mask: bool = True
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, x):
        lw = self.layer_widths
        kw = dict(norm=self.norm, frozen_stats=self.frozen_stats)
        x1 = DoubleConv(lw[0], name="inc", **kw)(x)
        x2 = Down(lw[1], name="down1", **kw)(x1)
        x3 = Down(lw[2], name="down2", **kw)(x2)
        x4 = Down(lw[3], name="down3", **kw)(x3)
        x5 = Down(lw[4], name="down4", **kw)(x4)
        h = Up(lw[5], name="up1", **kw)(x5, x4)
        h = Up(lw[6], name="up2", **kw)(h, x3)
        h = Up(lw[7], name="up3", **kw)(h, x2)
        h = Up(lw[8], name="up4", **kw)(h, x1)
        out_ch = self.n_classes + (1 if self.use_mask else 0)
        # outconv: a 1x1 AND a SAME 3x3 conv, summed (unet_parts.py:119-127)
        out = (
            nn.Conv(out_ch, (1, 1), name="outc")(h)
            + nn.Conv(out_ch, (3, 3), padding="SAME", name="outc2")(h)
        )
        if self.use_mask:
            rgb, mask = out[..., : self.n_classes], out[..., self.n_classes:]
            out = jnp.concatenate([rgb, jax.nn.sigmoid(mask)], axis=-1)
        return out
