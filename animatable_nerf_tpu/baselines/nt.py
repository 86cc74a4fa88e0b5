"""Neural Texture (NT) baseline.

Reference: lib/networks/nt/nt.py:6-30 + texture.py:6-33 — a 4-level
learnable texture pyramid sampled at precomputed SMPL UV coordinates
(align_corners=True bilinear), masked, and refined by the gated UNet
into rgb (+ mask channel).

TPU-native: textures are channels-last (H, W, C) params sampled with
core.grid.grid_bilerp; pyramid levels are summed exactly like the
reference (texture.py:29-31).
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import linen as nn

from ..core.grid import grid_bilerp
from .unet import UNet


class NeuralTexture(nn.Module):
    """4-level texture pyramid; levels at full, 1/2, 1/4, 1/8 resolution
    are all sampled at the same uv and summed (texture.py:6-31)."""

    size: int = 1024
    feature_dim: int = 16

    @nn.compact
    def __call__(self, uv, uv_mask):
        """uv: (H, W, 2) in [0, 1]; uv_mask: (H, W) -> (H, W, fdim)."""
        y = 0.0
        for lvl in range(4):
            s = self.size // (2 ** lvl)
            tex = self.param(
                f"layer{lvl + 1}",
                nn.initializers.normal(1.0),
                (s, s, self.feature_dim),
            )
            y = y + grid_bilerp(tex, uv)
        return y * uv_mask[..., None]


class NT(nn.Module):
    """Texture sample -> UNet refine (nt.py:19-22)."""

    size: int = 1024
    feature_dim: int = 16
    unet_widths: tuple = (64, 128, 256, 512, 512, 256, 128, 64, 32)
    # torch-BatchNorm semantics by default (baselines/unet.py); set
    # frozen_stats=True when serving torch-trained imports
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = True):
        x = NeuralTexture(
            size=self.size, feature_dim=self.feature_dim, name="texture"
        )(batch["uv"], batch["uv_msk"])
        out = UNet(
            n_classes=3, layer_widths=self.unet_widths, use_mask=True,
            norm=self.norm, frozen_stats=self.frozen_stats,
            name="unet",
        )(x[None])[0]
        return {"rgb_map": out[..., :3], "mask": out[..., 3]}
