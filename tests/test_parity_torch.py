"""Module-level numerical parity against PyTorch.

Builds torch modules in-test following the reference architecture tables
(SURVEY.md §2.3: Conv1d-k1 stacks, skip-concat wiring, latent embeds,
weight-normalized linears), runs them and our flax modules with the SAME
weights (through the compat converter), and asserts the outputs agree.
This is the end-to-end proof that converted reference checkpoints
reproduce reference activations.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn

from animatable_nerf_tpu.compat import conv1d_to_dense, weight_norm_to_wn
from animatable_nerf_tpu.core.encoding import positional_encoding
from animatable_nerf_tpu.fields import TPoseNeRF, BlendWeightField
from animatable_nerf_tpu.fields.fields import GeometricFieldNetwork


def _pe_torch(x, res):
    """The reference's embedder (lib/networks/embedder.py): [x, sin/cos
    at 2^0..2^(res-1)], matching core.encoding.positional_encoding."""
    outs = [x]
    for i in range(res):
        f = 2.0**i
        outs.append(torch.sin(x * f))
        outs.append(torch.cos(x * f))
    return torch.cat(outs, dim=-1)


class TorchTPoseHuman(tnn.Module):
    """tpose_nerf_network.py:218-275 rebuilt for the test."""

    def __init__(self, n_latents=3):
        super().__init__()
        self.nf_latent = tnn.Embedding(n_latents, 128)
        self.actvn = tnn.ReLU()
        input_ch = 63
        D, W = 8, 256
        self.skips = [4]
        self.pts_linears = tnn.ModuleList(
            [tnn.Conv1d(input_ch, W, 1)]
            + [
                tnn.Conv1d(W, W, 1)
                if i not in self.skips
                else tnn.Conv1d(W + input_ch, W, 1)
                for i in range(D - 1)
            ]
        )
        self.alpha_fc = tnn.Conv1d(W, 1, 1)
        self.feature_fc = tnn.Conv1d(W, W, 1)
        self.latent_fc = tnn.Conv1d(384, W, 1)
        self.view_fc = tnn.Conv1d(283, W // 2, 1)
        self.rgb_fc = tnn.Conv1d(W // 2, 3, 1)

    def forward(self, pts, viewdir, latent_index):
        pe = _pe_torch(pts, 10).t()[None]  # (1, 63, N)
        net = pe
        for i, l in enumerate(self.pts_linears):
            net = self.actvn(l(net))
            if i in self.skips:
                net = torch.cat((pe, net), dim=1)
        alpha = self.alpha_fc(net)
        feat = self.feature_fc(net)
        latent = self.nf_latent(latent_index)
        latent = latent[..., None].expand(*latent.shape, net.size(2))
        feat = torch.cat((feat, latent), dim=1)
        feat = self.latent_fc(feat)
        vd = _pe_torch(viewdir, 4).t()[None]
        feat = torch.cat((feat, vd), dim=1)
        net = self.actvn(self.view_fc(feat))
        rgb = self.rgb_fc(net)
        return alpha[0, 0], rgb[0].t()


def _convert_tpose_human(tm):
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    p = {"nf_latent": {"embedding": sd["nf_latent.weight"]}}
    for i in range(8):
        p[f"lin{i}"] = {
            "kernel": conv1d_to_dense(sd[f"pts_linears.{i}.weight"]),
            "bias": sd[f"pts_linears.{i}.bias"],
        }
    for name in ("alpha_fc", "feature_fc", "latent_fc", "view_fc", "rgb_fc"):
        p[name] = {
            "kernel": conv1d_to_dense(sd[f"{name}.weight"]),
            "bias": sd[f"{name}.bias"],
        }
    return {"params": p}


class TestTPoseHumanParity:
    def test_forward_matches_torch(self, rng):
        tm = TorchTPoseHuman(n_latents=3).eval()
        pts = rng.randn(40, 3).astype(np.float32) * 0.3
        vd = rng.randn(40, 3).astype(np.float32)
        with torch.no_grad():
            t_sigma, t_rgb = tm(
                torch.from_numpy(pts), torch.from_numpy(vd),
                torch.tensor([1]),
            )
        ours = TPoseNeRF(num_latents=3)
        params = _convert_tpose_human(tm)
        sigma, rgb = ours.apply(
            jax.tree_util.tree_map(jnp.asarray, params),
            jnp.asarray(pts), jnp.asarray(vd), jnp.asarray(1),
        )
        np.testing.assert_allclose(
            np.asarray(sigma), t_sigma.numpy(), rtol=1e-4, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(rgb), t_rgb.numpy(), rtol=1e-4, atol=1e-5
        )


class TorchBWField(tnn.Module):
    """tpose_nerf_network.py:25-77 rebuilt for the test."""

    def __init__(self, n_latents=4):
        super().__init__()
        self.bw_latent = tnn.Embedding(n_latents, 128)
        self.actvn = tnn.ReLU()
        input_ch = 191
        D, W = 8, 256
        self.skips = [4]
        self.bw_linears = tnn.ModuleList(
            [tnn.Conv1d(input_ch, W, 1)]
            + [
                tnn.Conv1d(W, W, 1)
                if i not in self.skips
                else tnn.Conv1d(W + input_ch, W, 1)
                for i in range(D - 1)
            ]
        )
        self.bw_fc = tnn.Conv1d(W, 24, 1)

    def forward(self, pts, smpl_bw, latent_index):
        pe = _pe_torch(pts, 10).t()[None]  # (1, 63, N)
        latent = self.bw_latent(latent_index)
        latent = latent[..., None].expand(*latent.shape, pe.size(2))
        feats = torch.cat((pe, latent), dim=1)
        net = feats
        for i, l in enumerate(self.bw_linears):
            net = self.actvn(l(net))
            if i in self.skips:
                net = torch.cat((feats, net), dim=1)
        bw = self.bw_fc(net)  # (1, 24, N)
        bw = torch.log(smpl_bw.t()[None] + 1e-9) + bw
        return torch.softmax(bw, dim=1)[0].t()


class TestBWFieldParity:
    def test_forward_matches_torch(self, rng):
        tm = TorchBWField(n_latents=4).eval()
        pts = rng.randn(30, 3).astype(np.float32) * 0.3
        smpl_bw = rng.rand(30, 24).astype(np.float32)
        smpl_bw /= smpl_bw.sum(-1, keepdims=True)
        with torch.no_grad():
            want = tm(
                torch.from_numpy(pts), torch.from_numpy(smpl_bw),
                torch.tensor([2]),
            ).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        from animatable_nerf_tpu.compat.torch_import import _bw_field

        params = {"params": _bw_field(sd)}
        ours = BlendWeightField(num_latents=4)
        got = ours.apply(
            jax.tree_util.tree_map(jnp.asarray, params),
            jnp.asarray(pts), jnp.asarray(smpl_bw), jnp.asarray(2),
        )
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=1e-4, atol=1e-5
        )


class TorchSDFNetwork(tnn.Module):
    """anisdf_pdf_network.py:348-453 rebuilt: 9 weight-normed linears,
    softplus(beta=100), skip at 4 with /sqrt(2)."""

    def __init__(self):
        super().__init__()
        dims = [39] + [256] * 8 + [257]
        self.skip_in = (4,)
        self.num_layers = len(dims)
        for l in range(self.num_layers - 1):
            out_dim = (
                dims[l + 1] - dims[0] if (l + 1) in self.skip_in
                else dims[l + 1]
            )
            lin = tnn.utils.weight_norm(tnn.Linear(dims[l], out_dim))
            setattr(self, "lin" + str(l), lin)
        self.activation = tnn.Softplus(beta=100)

    def forward(self, pts):
        inputs = _pe_torch(pts, 6)
        x = inputs
        for l in range(self.num_layers - 1):
            lin = getattr(self, "lin" + str(l))
            if l in self.skip_in:
                x = torch.cat([x, inputs], 1) / np.sqrt(2)
            x = lin(x)
            if l < self.num_layers - 2:
                x = self.activation(x)
        return x


class TestSDFNetworkParity:
    def test_forward_matches_torch(self, rng):
        tm = TorchSDFNetwork().eval()
        pts = rng.randn(25, 3).astype(np.float32) * 0.3
        with torch.no_grad():
            want = tm(torch.from_numpy(pts)).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        layers = []
        for l in range(9):
            layers.append(
                weight_norm_to_wn(
                    sd[f"lin{l}.weight_v"], sd[f"lin{l}.weight_g"],
                    sd[f"lin{l}.bias"],
                )
            )
        ours = GeometricFieldNetwork()
        params = {"params": {"layers": jax.tree_util.tree_map(
            jnp.asarray, layers
        )}}
        got = ours.apply(params, jnp.asarray(pts))
        np.testing.assert_allclose(
            np.asarray(got), want, rtol=2e-4, atol=2e-4
        )


class TorchColorNetwork(tnn.Module):
    """anisdf_pdf_network.py:468-549 rebuilt: IDR rendering net, 5
    weight-normed linears, 128-d frame latent concat before lin3,
    sigmoid out. mode='idr' takes [pts, PE(viewdir), normals, feats];
    mode='no_normal' drops the normals (aligned_aninerf_pdf_network.py:
    296-344)."""

    def __init__(self, n_latents=4, mode="idr"):
        super().__init__()
        self.mode = mode
        self.color_latent = tnn.Embedding(n_latents, 128)
        d_in = 9 if mode == "idr" else 6
        d0 = d_in + 256 + 24  # +24: PE lift of the 3-d viewdir
        self.lin0 = tnn.utils.weight_norm(tnn.Linear(d0, 256))
        self.lin1 = tnn.utils.weight_norm(tnn.Linear(256, 256))
        self.lin2 = tnn.utils.weight_norm(tnn.Linear(256, 256))
        self.lin3 = tnn.utils.weight_norm(tnn.Linear(256 + 128, 256))
        self.lin4 = tnn.utils.weight_norm(tnn.Linear(256, 3))
        self.relu = tnn.ReLU()

    def forward(self, points, normals, view_dirs, feats, latent_index):
        view_dirs = _pe_torch(view_dirs, 4)
        if self.mode == "idr":
            x = torch.cat([points, view_dirs, normals, feats], dim=-1)
        else:
            x = torch.cat([points, view_dirs, feats], dim=-1)
        net = self.relu(self.lin0(x))
        net = self.relu(self.lin1(net))
        net = self.relu(self.lin2(net))
        latent = self.color_latent(latent_index)
        latent = latent.expand(net.size(0), latent.size(1))
        net = self.relu(self.lin3(torch.cat((net, latent), dim=1)))
        return torch.sigmoid(self.lin4(net))


class TestColorNetworkParity:
    @pytest.mark.parametrize("mode", ["idr", "no_normal"])
    def test_forward_matches_torch(self, rng, mode):
        from animatable_nerf_tpu.compat.torch_import import _wn_color
        from animatable_nerf_tpu.fields import ColorNetwork

        tm = TorchColorNetwork(n_latents=4, mode=mode).eval()
        n = 17
        pts = rng.randn(n, 3).astype(np.float32) * 0.3
        normals = rng.randn(n, 3).astype(np.float32)
        vd = rng.randn(n, 3).astype(np.float32)
        feats = rng.randn(n, 256).astype(np.float32) * 0.2
        with torch.no_grad():
            want = tm(
                torch.from_numpy(pts), torch.from_numpy(normals),
                torch.from_numpy(vd), torch.from_numpy(feats),
                torch.tensor([2]),
            ).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = {"params": jax.tree_util.tree_map(
            jnp.asarray, _wn_color(sd, "")
        )}
        ours = ColorNetwork(num_latents=4, use_normals=(mode == "idr"))
        got = ours.apply(
            params, jnp.asarray(pts), jnp.asarray(normals),
            jnp.asarray(vd), jnp.asarray(feats), jnp.asarray(2),
        )
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)


class TorchResidualField(tnn.Module):
    """anisdf_pdf_network.py:23-31,49-64 rebuilt: poses-conditioned
    displacement MLP (input 63 PE + 72 poses), 0.05*tanh out."""

    def __init__(self):
        super().__init__()
        self.actvn = tnn.ReLU()
        input_ch, D, W = 135, 8, 256
        self.skips = [4]
        self.resd_linears = tnn.ModuleList(
            [tnn.Conv1d(input_ch, W, 1)]
            + [
                tnn.Conv1d(W, W, 1) if i not in self.skips
                else tnn.Conv1d(W + input_ch, W, 1)
                for i in range(D - 1)
            ]
        )
        self.resd_fc = tnn.Conv1d(W, 3, 1)

    def forward(self, pts, poses):
        pe = _pe_torch(pts, 10).t()[None]  # (1, 63, N)
        latent = poses[:, :, None].expand(1, 72, pe.size(2))
        feats = torch.cat((pe, latent), dim=1)
        net = feats
        for i, l in enumerate(self.resd_linears):
            net = self.actvn(l(net))
            if i in self.skips:
                net = torch.cat((feats, net), dim=1)
        resd = self.resd_fc(net)
        return 0.05 * torch.tanh(resd)[0].t()


class TestResidualFieldParity:
    def test_forward_matches_torch(self, rng):
        from animatable_nerf_tpu.compat.torch_import import _skip_mlp
        from animatable_nerf_tpu.fields import ResidualField

        tm = TorchResidualField().eval()
        pts = rng.randn(21, 3).astype(np.float32) * 0.3
        poses = rng.randn(1, 72).astype(np.float32) * 0.2
        with torch.no_grad():
            want = tm(torch.from_numpy(pts), torch.from_numpy(poses)).numpy()
        sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
        params = {"params": {"mlp": jax.tree_util.tree_map(
            jnp.asarray, _skip_mlp(sd, "resd_linears", "resd_fc")
        )}}
        ours = ResidualField()
        got = ours.apply(params, jnp.asarray(pts), jnp.asarray(poses[0]))
        np.testing.assert_allclose(np.asarray(got), want, rtol=1e-4, atol=1e-5)
