"""PointNet++ multi-scale-grouping feature network, built on the
TPU-native point ops (ops/pointnet2.py).

Mirrors the reference's Pointnet2MSG
(lib/networks/pointnet2/pointnet2_msg.py:24-100: 4 set-abstraction MSG
levels + 4 feature-propagation levels, use_xyz=True), which runs on the
lib/csrc/pointnet2 CUDA kernels. Differences for TPU:

  * channels-last (B, N, C) instead of (B, C, N);
  * normalization defaults to reference-faithful torch BatchNorm
    semantics (baselines/unet.py TorchBatchNorm: batch stats when
    frozen_stats=False, stored running stats when True); GroupNorm
    stays available via norm="group" (stateless under pjit);
  * grouping/interp are the static-shape XLA ops from ops/pointnet2.

Per-group MLPs are 1x1 convs in the reference = Dense over the channel
axis here, which is exactly an MXU matmul over (B*S*nsample, C).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import pointnet2 as pn2
from .unet import make_norm


class _PointMLP(nn.Module):
    """Dense + norm + ReLU stack over the trailing channel axis
    (pt_utils.SharedMLP: Conv2d k=1 without bias + BatchNorm2d + ReLU)."""

    widths: Sequence[int]
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, x):
        for i, w in enumerate(self.widths):
            # bias folds into the norm (reference _ConvBase: bias = not bn)
            x = nn.Dense(w, use_bias=False, name=f"lin{i}")(x)
            x = make_norm(self.norm, w, f"bn{i}", self.frozen_stats)(x)
            x = nn.relu(x)
        return x


class SetAbstractionMSG(nn.Module):
    """Multi-scale grouping set abstraction (PointnetSAModuleMSG).

    For each radius scale: ball-query `nsample` neighbors around the
    FPS-sampled centers, localize coords, run the per-point MLP, max-pool
    over the group. Scale outputs are concatenated.
    """

    npoint: int
    radii: Sequence[float]
    nsamples: Sequence[int]
    mlps: Sequence[Sequence[int]]
    use_xyz: bool = True
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, xyz, features):
        """xyz (B, N, 3); features (B, N, C) or None ->
        (new_xyz (B, npoint, 3), new_features (B, npoint, sum(C_out)))."""
        fps_idx = pn2.furthest_point_sample(xyz, self.npoint)
        new_xyz = pn2.gather_points(xyz, fps_idx)
        outs = []
        for s, (radius, nsample, widths) in enumerate(
            zip(self.radii, self.nsamples, self.mlps)
        ):
            idx = pn2.ball_query(radius, nsample, xyz, new_xyz)
            grouped_xyz = pn2.group_points(xyz, idx) - new_xyz[:, :, None]
            if features is not None:
                grouped = pn2.group_points(features, idx)
                if self.use_xyz:
                    grouped = jnp.concatenate([grouped_xyz, grouped], -1)
            else:
                grouped = grouped_xyz
            h = _PointMLP(
                widths, norm=self.norm, frozen_stats=self.frozen_stats,
                name=f"scale{s}",
            )(grouped)
            outs.append(jnp.max(h, axis=2))  # pool over the group
        return new_xyz, jnp.concatenate(outs, axis=-1)


class FeaturePropagation(nn.Module):
    """3-NN inverse-distance feature upsampling (PointnetFPModule)."""

    widths: Sequence[int]
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, unknown_xyz, known_xyz, unknown_feats, known_feats):
        dist, idx = pn2.three_nn(unknown_xyz, known_xyz)
        w = pn2.interpolation_weights(dist)
        interp = pn2.three_interpolate(known_feats, idx, w)
        if unknown_feats is not None:
            interp = jnp.concatenate([interp, unknown_feats], axis=-1)
        return _PointMLP(
            self.widths, norm=self.norm, frozen_stats=self.frozen_stats,
            name="mlp",
        )(interp)


class PointNet2MSG(nn.Module):
    """4-level MSG encoder-decoder over a point cloud.

    Defaults follow lib/networks/pointnet2/pointnet2_msg.py:14-18 (with
    the class-default radii the reference actually instantiates at
    :27-29) scaled to the 6890-vertex SMPL cloud; `out_dim` is the
    per-point output feature width (18 for NHR, nhr.py:14).
    """

    out_dim: int = 18
    npoints: Sequence[int] = (4096, 1024, 256, 64)
    radii: Sequence[Sequence[float]] = (
        (0.1, 0.5), (0.5, 1.0), (1.0, 2.0), (2.0, 4.0)
    )
    nsamples: Sequence[Sequence[int]] = ((16, 32),) * 4
    mlps: Sequence[Sequence[Sequence[int]]] = (
        ((16, 16), (32, 32)),
        ((32, 32), (32, 32)),
        ((64, 64), (64, 64)),
        ((64, 64), (64, 64)),
    )
    fp_widths: Sequence[Sequence[int]] = (
        None,  # filled with (out_dim, out_dim) below
        (256, 256),
        (512, 512),
        (512, 512),
    )
    norm: str = "batch"
    frozen_stats: bool = False

    @nn.compact
    def __call__(self, xyz, features=None):
        """xyz (B, N, 3) -> per-point features (B, N, out_dim)."""
        l_xyz = [xyz]
        l_feat = [features]
        for k in range(len(self.npoints)):
            nx, nf = SetAbstractionMSG(
                npoint=self.npoints[k],
                radii=self.radii[k],
                nsamples=self.nsamples[k],
                mlps=self.mlps[k],
                norm=self.norm,
                frozen_stats=self.frozen_stats,
                name=f"sa{k}",
            )(l_xyz[-1], l_feat[-1])
            l_xyz.append(nx)
            l_feat.append(nf)
        fp_widths = [
            (self.out_dim, self.out_dim) if w is None else w
            for w in self.fp_widths
        ]
        for k in range(len(fp_widths) - 1, -1, -1):
            l_feat[k] = FeaturePropagation(
                widths=fp_widths[k], norm=self.norm,
                frozen_stats=self.frozen_stats, name=f"fp{k}",
            )(l_xyz[k], l_xyz[k + 1], l_feat[k], l_feat[k + 1])
        return l_feat[0]
