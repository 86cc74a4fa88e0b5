"""The field modules composing every model family.

All modules are point-batched: inputs are (N, C) channels-last matrices
(one big MXU matmul per layer), never per-chunk loops.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..core.encoding import positional_encoding, encoding_dim
from .mlp import SkipMLP, WNDense, geometric_mlp_params, wn_apply


class BlendWeightField(nn.Module):
    """Neural blend-weight field.

    PE(xyz) (63) + a 128-d per-frame latent -> 8x256 skip-4 MLP -> 24
    logits, added to log(smpl_bw + 1e-9) and softmaxed.
    Reference: tpose_nerf_network.py:25-29,55-77 and the novel-pose
    variant :278-315 (identical architecture, its own latent table).
    """

    num_latents: int
    xyz_res: int = 10
    latent_dim: int = 128
    dtype: Any = jnp.float32
    fused: bool = False

    @nn.compact
    def __call__(self, pts, smpl_bw, latent_index):
        """pts (N, 3); smpl_bw (N, 24); latent_index scalar int -> (N, 24)."""
        pe = positional_encoding(pts, self.xyz_res)
        # 1-D index: flax Embed's num_embeddings==1 fast path breaks on
        # scalar indices (single-frame configs)
        latent = nn.Embed(self.num_latents, self.latent_dim, name="latent")(
            jnp.reshape(latent_index, (1,))
        )[0]
        latent = jnp.broadcast_to(latent, (*pe.shape[:-1], self.latent_dim))
        feat = jnp.concatenate([pe, latent], axis=-1)
        logits = SkipMLP(
            depth=8, width=256, out_dim=24, name="mlp", dtype=self.dtype,
            fused=self.fused,
        )(feat)
        return jax.nn.softmax(jnp.log(smpl_bw + 1e-9) + logits, axis=-1)


class ResidualField(nn.Module):
    """Pose-dependent displacement field: PE(xyz) (63) + pose vector (72)
    -> 8x256 skip-4 MLP -> 3, scaled by 0.05 * tanh.

    Reference: anisdf_pdf_network.py:23-32,49-73 (final bias zero-init so
    the initial displacement is ~0). The pbw-ablation variant conditions
    the blend-weight MLP on the same pose vector
    (aligned_aninerf_pbw_network.py:46-62).
    """

    xyz_res: int = 10
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts, pose_vec):
        """pts (N, 3); pose_vec (72,) -> resd (N, 3)."""
        pe = positional_encoding(pts, self.xyz_res)
        pose = jnp.broadcast_to(pose_vec, (*pe.shape[:-1], pose_vec.shape[-1]))
        feat = jnp.concatenate([pe, pose], axis=-1)
        out = SkipMLP(
            depth=8, width=256, out_dim=3, name="mlp", dtype=self.dtype
        )(feat)
        return 0.05 * jnp.tanh(out)


class TPoseNeRF(nn.Module):
    """Canonical-space NeRF: PE(xyz) -> 8x256 skip-4 -> density head +
    view/latent-conditioned rgb head.

    Exact wiring (tpose_nerf_network.py:218-275): alpha_fc on the trunk;
    feature_fc(trunk) concat frame-latent -> latent_fc (NO activation);
    concat PE(viewdir) -> view_fc -> relu -> rgb_fc.
    """

    num_latents: int
    xyz_res: int = 10
    view_res: int = 4
    dtype: Any = jnp.float32
    fused: bool = False

    def setup(self):
        from .mlp import dense_param_init

        dt = self.dtype
        pe_dim = encoding_dim(self.xyz_res, 3)
        trunk = []
        d_in = pe_dim
        for i in range(8):
            trunk.append(self.param(f"lin{i}", dense_param_init(d_in, 256)))
            d_in = 256 + (pe_dim if i == 4 else 0)
        self.trunk_layers = trunk
        self.alpha_fc = nn.Dense(1, name="alpha_fc", dtype=dt)
        self.feature_fc = nn.Dense(256, name="feature_fc", dtype=dt)
        self.nf_latent = nn.Embed(self.num_latents, 128, name="nf_latent")
        self.latent_fc = nn.Dense(256, name="latent_fc", dtype=dt)
        self.view_fc = nn.Dense(128, name="view_fc", dtype=dt)
        self.rgb_fc = nn.Dense(3, name="rgb_fc", dtype=dt)

    def _trunk(self, pts):
        pe = positional_encoding(pts, self.xyz_res)
        layers = [(p["kernel"], p["bias"]) for p in self.trunk_layers]

        if self.fused and jax.default_backend() == "tpu":
            from ..ops.mlp_pallas import make_fused_skip_mlp

            # 8 activated layers, skip re-concat after layer 4; act_last
            # because the trunk output feeds the heads post-ReLU
            f = make_fused_skip_mlp(skips=(4,), act="relu", act_last=True)
            return f(pe.astype(jnp.float32), layers)

        pe = pe.astype(self.dtype)
        h = pe
        for i, (w, b) in enumerate(layers):
            h = nn.relu(h @ w.astype(self.dtype) + b.astype(self.dtype))
            if i == 4:
                h = jnp.concatenate([pe, h], axis=-1)
        return h

    def density(self, pts):
        """Density-only path (tpose_nerf_network.py:241-250
        `calculate_alpha`). pts (N, 3) -> sigma (N,)."""
        return self.alpha_fc(self._trunk(pts))[..., 0].astype(jnp.float32)

    def __call__(self, pts, viewdir, latent_index):
        """pts (N, 3), viewdir (N, 3), latent_index scalar
        -> (sigma (N,), rgb_logits (N, 3))."""
        h = self._trunk(pts)
        sigma = self.alpha_fc(h)[..., 0].astype(jnp.float32)

        feat = self.feature_fc(h)
        latent = self.nf_latent(
            jnp.reshape(latent_index, (1,))
        )[0].astype(self.dtype)
        latent = jnp.broadcast_to(latent, (*feat.shape[:-1], 128))
        feat = self.latent_fc(jnp.concatenate([feat, latent], axis=-1))
        vdir = positional_encoding(viewdir, self.view_res).astype(self.dtype)
        h2 = nn.relu(self.view_fc(jnp.concatenate([feat, vdir], axis=-1)))
        rgb = self.rgb_fc(h2).astype(jnp.float32)
        return sigma, rgb


class GeometricFieldNetwork(nn.Module):
    """Weight-normalized, geometric-init 9-layer field network used both
    as the SDF network (anisdf_pdf_network.py:348-453) and the softplus
    NeRF of the aligned models (aligned_aninerf_pdf_network.py:204-292).

    Input: xyz with multires-6 PE (39ch). Output: (N, 257) — channel 0 is
    sdf (or pre-activation density), channels 1: are the feature vector.
    Skip at layer 4: x = concat([x, inputs]) / sqrt(2) before lin4.
    Activation: softplus(beta=100) on all but the last layer.
    """

    multires: int = 6
    d_hidden: int = 256
    n_layers: int = 8
    d_out: int = 257
    skip_in: Sequence[int] = (4,)
    bias: float = 0.5
    scale: float = 1.0
    # matmul/activation compute dtype (params + weight norms stay f32;
    # output is cast back to f32). bf16 is the eval fast-variant knob:
    # the 9-layer trunk's inter-layer (N, 256) activations are the HBM
    # bound at whole-frame point counts.
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, pts):
        d_in = pts.shape[-1]
        dims = [encoding_dim(self.multires, d_in)] + [
            self.d_hidden
        ] * self.n_layers + [self.d_out]

        layers = self.param(
            "layers",
            lambda key: geometric_mlp_params(
                key, dims, list(self.skip_in), bias=self.bias, d_raw_in=d_in
            ),
        )

        inputs = positional_encoding(pts * self.scale, self.multires).astype(
            self.dtype
        )
        x = inputs
        n = len(dims)
        for l in range(n - 1):
            if l in self.skip_in:
                x = jnp.concatenate([x, inputs], axis=-1) / np.sqrt(2).astype(
                    self.dtype
                )
            x = wn_apply(layers[l], x, dtype=self.dtype)
            if l < n - 2:
                # softplus with beta=100: log(1 + exp(100 x)) / 100
                x = jax.nn.softplus(100.0 * x) / 100.0
        x = x.astype(jnp.float32)
        return jnp.concatenate([x[..., :1] / self.scale, x[..., 1:]], axis=-1)


class ColorNetwork(nn.Module):
    """IDR-style rendering network (anisdf_pdf_network.py:468-549 with
    normals, aligned_aninerf_pdf_network.py:296-379 without).

    Input: [points, PE(viewdir) (27), (normals,) features (256)];
    lin0..lin2 (256) -> concat 128-d frame latent -> lin3 -> lin4 -> sigmoid.
    All layers weight-normalized.
    """

    num_latents: int
    use_normals: bool = True
    use_viewdir: bool = True
    view_res: int = 4
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, points, normals, viewdirs, features, latent_index):
        parts = [points]
        if self.use_viewdir:
            parts.append(positional_encoding(viewdirs, self.view_res))
        if self.use_normals:
            parts.append(normals)
        parts.append(features)
        x = jnp.concatenate(
            [p.astype(self.dtype) for p in parts], axis=-1
        )

        dt = self.dtype
        h = nn.relu(WNDense(256, name="lin0", dtype=dt)(x))
        h = nn.relu(WNDense(256, name="lin1", dtype=dt)(h))
        h = nn.relu(WNDense(256, name="lin2", dtype=dt)(h))
        latent = nn.Embed(self.num_latents, 128, name="color_latent")(
            jnp.reshape(latent_index, (1,))
        )[0].astype(dt)
        latent = jnp.broadcast_to(latent, (*h.shape[:-1], 128))
        h = nn.relu(
            WNDense(256, name="lin3", dtype=dt)(
                jnp.concatenate([h, latent], -1)
            )
        )
        return jax.nn.sigmoid(
            WNDense(3, name="lin4", dtype=dt)(h).astype(jnp.float32)
        )


class BetaNetwork(nn.Module):
    """Single learnable VolSDF beta (anisdf_pdf_network.py:456-465)."""

    init_val: float = 0.1

    @nn.compact
    def __call__(self):
        beta = self.param("beta", lambda _: jnp.asarray(self.init_val))
        return jnp.clip(beta, 1e-9, 1e6)


class SingleVarianceNetwork(nn.Module):
    """NeuS inverse-variance: exp(10 * s) with learnable s
    (anisdf_neus_pdf_network.py:373-383)."""

    init_val: float = 0.2

    @nn.compact
    def __call__(self):
        s = self.param("variance", lambda _: jnp.asarray(self.init_val))
        return jnp.clip(jnp.exp(10.0 * s), 1e-6, 1e6)
