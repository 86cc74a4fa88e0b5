"""NHR baseline: point-cloud neural rendering of the SMPL vertex cloud.

Reference: lib/networks/nhr/nhr.py:10-57 + pcprender.py:60-125. Per
view: warp the canonical SMPL vertices to the posed frame (T-pose ->
big-pose LBS -> posed -> world, using grid-sampled blend weights), run
PointNet++ MSG over the posed cloud, splat through the differentiable
rasterizer (ops/rasterize — the PCPR replacement) with the learned
default feature filling miss pixels (PCPRParameters semantics), append
per-pixel world view directions, and refine with the gated UNet
(reference widths) into rgb + mask.

TPU-native: the whole forward is one jittable function of static image
shape; rasterization is scatter-min based (static shapes); layouts are
channels-last.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..core.grid import pts_sample_blend_weights
from ..core.lbs import (
    pose_points_to_tpose_points,
    tpose_points_to_pose_points,
    pose_points_to_world_points,
)
from ..ops.rasterize import rasterize_points
from .pointnet2_msg import PointNet2MSG
from .unet import UNet


def pixel_dirs_world(H: int, W: int, K, R):
    """Per-pixel world-space viewing directions (pcprender.py:79-100:
    Kinv @ [u, v, 1] rotated camera->world, normalized)."""
    u = jnp.arange(W, dtype=jnp.float32)
    v = jnp.arange(H, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(u, v)  # (H, W)
    pix = jnp.stack([uu, vv, jnp.ones_like(uu)], axis=-1)  # (H, W, 3)
    cam_dirs = pix @ jnp.linalg.inv(K).T
    world = cam_dirs @ R  # R^T applied row-wise: cam -> world
    return world / (jnp.linalg.norm(world, axis=-1, keepdims=True) + 1e-8)


class NHR(nn.Module):
    """End-to-end NHR network.

    Call with a batch dict carrying the NHR dataset keys
    (lib/datasets/h36m/nhr.py:153-180): tpose (V,3), tbw, tbounds,
    big_A, A, R, Th, K (3,3), RT (3,4 world->cam); H/W are static
    attrs. `pointnet_kwargs` / `unet_widths` shrink the submodules for
    tests and small clouds.
    """

    H: int
    W: int
    feature_dim: int = 18
    splat_radius: int = 2
    pointnet_kwargs: dict = None
    # the reference NHR refiner's widths (pcprender.py:42-47)
    unet_widths: tuple = (32, 64, 180, 450, 450, 180, 64, 32, 26)
    # torch-BatchNorm semantics by default (baselines/unet.py)
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, batch, train: bool = True):
        tverts = batch["tpose"]  # (V, 3) canonical vertices
        bw = pts_sample_blend_weights(
            tverts, batch["tbw"], batch["tbounds"]
        )[..., :24]
        bw = bw / jnp.maximum(bw.sum(-1, keepdims=True), 1e-8)
        # nhr.py:29-35: big-pose -> T-pose -> posed -> world
        ppose = pose_points_to_tpose_points(tverts, bw, batch["big_A"])
        pverts = tpose_points_to_pose_points(ppose, bw, batch["A"])
        wverts = pose_points_to_world_points(
            pverts, batch["R"], batch["Th"]
        )

        pn_kwargs = dict(self.pointnet_kwargs or {})
        point_feats = PointNet2MSG(
            out_dim=self.feature_dim, norm=self.norm,
            frozen_stats=self.frozen_stats, name="pointnet", **pn_kwargs
        )(pverts[None])[0]  # (V, fdim)
        # learned default feature vector filling pixels no point splats
        # to — exactly PCPR's miss fill (PCPRParameters.default_features,
        # pcpr_parameters.py:10-11; the splatter writes it where
        # depth == 0), NOT an extra concatenated channel block
        default_feats = self.param(
            "default_features",
            nn.initializers.normal(0.02),
            (self.feature_dim,),
        )

        K = batch["K"]
        RT = batch["RT"]
        ras = rasterize_points(
            wverts, point_feats, K, RT[:3, :3], RT[:3, 3:],
            self.H, self.W, splat_radius=self.splat_radius,
        )
        feat_map = jnp.where(
            ras["mask"][..., None], ras["feature_map"], default_feats
        )
        dirs = pixel_dirs_world(self.H, self.W, K, RT[:3, :3])
        dirs = jnp.where(ras["mask"][..., None], dirs, 0.0)
        # fuse: fdim splat/miss features + 3 world view dirs = the
        # reference's 21-channel UNet input (pcprender.py:106-119)
        fused = jnp.concatenate([feat_map, dirs], axis=-1)

        out = UNet(
            n_classes=3, layer_widths=self.unet_widths, use_mask=True,
            norm=self.norm, frozen_stats=self.frozen_stats,
            name="unet",
        )(fused[None])[0]
        return {
            "rgb_map": out[..., :3],
            "mask": out[..., 3],
            "depth": ras["depth"],
            "point_mask": ras["mask"],
        }
