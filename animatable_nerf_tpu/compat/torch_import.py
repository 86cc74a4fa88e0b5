"""Convert reference PyTorch checkpoints to this framework's flax params.

The reference saves {'net': state_dict, 'optim', 'scheduler', 'recorder',
'epoch'} (lib/utils/net_utils.py:325-338). The layer-name maps below
follow the architecture tables of SURVEY.md §2.3:

  AniNeRF (tpose_nerf_network.py):
    bw_latent.weight                 -> bw_field/latent/embedding
    bw_linears.{i}.{weight,bias}     -> bw_field/mlp/lin{i}   (Conv1d k=1)
    bw_fc.{weight,bias}              -> bw_field/mlp/out
    tpose_human.pts_linears.{i}      -> tpose_human/lin{i}
    tpose_human.{alpha,feature,latent,view,rgb}_fc -> same names
    tpose_human.nf_latent.weight     -> tpose_human/nf_latent/embedding
    novel_pose_bw.*                  -> novel_pose_bw/* (same as bw_field)

  SDF-PDF (anisdf_pdf_network.py):
    resd_linears.{i} / resd_fc       -> resd_field/mlp/lin{i} | out
    tpose_human.sdf_network.lin{l}.{weight_v,weight_g,bias}
                                     -> sdf_network/layers[l] {v,g,b}
    tpose_human.beta_network.beta    -> beta_network/beta
    tpose_human.color_network.lin{l} -> color_network/lin{l}/wn
    tpose_human.color_network.color_latent.weight
                                     -> color_network/color_latent/embedding

Tensor conventions: torch Conv1d(k=1) weight is (out, in, 1) and Linear
is (out, in); flax Dense kernels are (in, out) — `conv1d_to_dense` /
`linear_to_dense` transpose accordingly. torch weight_norm stores
weight_g (out, 1) + weight_v (out, in) with dim=0 norms; our WN layers
store {v (in, out), g (out,), b (out,)} (fields/mlp.py).
"""

from __future__ import annotations

import numpy as np


def load_torch_state_dict(path):
    """Load a reference .pth checkpoint -> (state_dict of numpy arrays,
    epoch). Uses torch only for deserialization."""
    import torch

    ckpt = torch.load(path, map_location="cpu", weights_only=False)
    state = ckpt["net"] if "net" in ckpt else ckpt
    out = {k: v.detach().cpu().numpy() for k, v in state.items()}
    return out, int(ckpt.get("epoch", 0)) if isinstance(ckpt, dict) else 0


def conv1d_to_dense(w: np.ndarray) -> np.ndarray:
    """torch Conv1d(k=1) weight (out, in, 1) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w[:, :, 0].T)


def linear_to_dense(w: np.ndarray) -> np.ndarray:
    """torch Linear weight (out, in) -> flax Dense kernel (in, out)."""
    return np.ascontiguousarray(w.T)


def weight_norm_to_wn(weight_v: np.ndarray, weight_g: np.ndarray,
                      bias: np.ndarray) -> dict:
    """torch nn.utils.weight_norm(Linear) params -> our {v, g, b}."""
    return {
        "v": linear_to_dense(weight_v),
        "g": np.ascontiguousarray(weight_g.reshape(-1)),
        "b": np.ascontiguousarray(bias),
    }


def _skip_mlp(state, prefix_linears, prefix_fc, depth=8):
    """Conv1d stack + out head -> SkipMLP param dict."""
    p = {}
    for i in range(depth):
        p[f"lin{i}"] = {
            "kernel": conv1d_to_dense(state[f"{prefix_linears}.{i}.weight"]),
            "bias": np.ascontiguousarray(state[f"{prefix_linears}.{i}.bias"]),
        }
    p["out"] = {
        "kernel": conv1d_to_dense(state[f"{prefix_fc}.weight"]),
        "bias": np.ascontiguousarray(state[f"{prefix_fc}.bias"]),
    }
    return p


def _bw_field(state, prefix=""):
    return {
        "latent": {"embedding": state[f"{prefix}bw_latent.weight"]},
        "mlp": _skip_mlp(state, f"{prefix}bw_linears", f"{prefix}bw_fc"),
    }


def convert_aninerf(state: dict) -> dict:
    """Reference tpose_nerf_network state dict -> AniNeRF params
    (models/aninerf.py). Returns the {'params': ...} tree."""
    th = "tpose_human."
    tpose = {
        "alpha_fc": {
            "kernel": conv1d_to_dense(state[th + "alpha_fc.weight"]),
            "bias": state[th + "alpha_fc.bias"],
        },
        "feature_fc": {
            "kernel": conv1d_to_dense(state[th + "feature_fc.weight"]),
            "bias": state[th + "feature_fc.bias"],
        },
        "latent_fc": {
            "kernel": conv1d_to_dense(state[th + "latent_fc.weight"]),
            "bias": state[th + "latent_fc.bias"],
        },
        "view_fc": {
            "kernel": conv1d_to_dense(state[th + "view_fc.weight"]),
            "bias": state[th + "view_fc.bias"],
        },
        "rgb_fc": {
            "kernel": conv1d_to_dense(state[th + "rgb_fc.weight"]),
            "bias": state[th + "rgb_fc.bias"],
        },
        "nf_latent": {"embedding": state[th + "nf_latent.weight"]},
    }
    for i in range(8):
        tpose[f"lin{i}"] = {
            "kernel": conv1d_to_dense(state[f"{th}pts_linears.{i}.weight"]),
            "bias": state[f"{th}pts_linears.{i}.bias"],
        }
    params = {
        "bw_field": _bw_field(state),
        "tpose_human": tpose,
    }
    if any(k.startswith("novel_pose_bw.") for k in state):
        params["novel_pose_bw"] = _bw_field(state, "novel_pose_bw.")
    return {"params": params}


def _wn_layers(state, prefix: str, n_layers: int = 9):
    """Weight-normed Linear stack lin{l} -> list of {v, g, b}."""
    return [
        weight_norm_to_wn(
            state[f"{prefix}lin{l}.weight_v"],
            state[f"{prefix}lin{l}.weight_g"],
            state[f"{prefix}lin{l}.bias"],
        )
        for l in range(n_layers)
    ]


def _wn_color(state, prefix: str) -> dict:
    """IDR ColorNetwork (5 weight-normed Linears + frame latent)."""
    color = {
        "color_latent": {"embedding": state[prefix + "color_latent.weight"]},
    }
    for l in range(5):
        color[f"lin{l}"] = {
            "wn": weight_norm_to_wn(
                state[f"{prefix}lin{l}.weight_v"],
                state[f"{prefix}lin{l}.weight_g"],
                state[f"{prefix}lin{l}.bias"],
            )
        }
    return color


def convert_nerf_pdf(state: dict) -> dict:
    """Reference aligned_aninerf_pdf_network state dict -> NeRFPDF params
    (models/pdf.py). The displacement MLP is poses-conditioned Conv1d
    (aligned_aninerf_pdf_network.py:27-31; the declared resd_latent is
    dead in the reference's forward path and skipped); the canonical
    field is the weight-normed geometric NeRFNetwork (:205-270) and the
    no-normals IDR ColorNetwork (:296-344). Returns {'params': ...}."""
    th = "tpose_human."
    return {
        "params": {
            "resd_field": {
                "mlp": _skip_mlp(state, "resd_linears", "resd_fc")
            },
            "nerf_network": {
                "layers": _wn_layers(state, th + "nerf_network.")
            },
            "color_network": _wn_color(state, th + "color_network."),
        }
    }


def convert_aligned_lbw(state: dict) -> dict:
    """Reference aligned_aninerf_lbw_network state dict -> AlignedLBW
    params (models/aligned.py): neural blend-weight field (+ optional
    novel_pose_bw) and the same geometric NeRF + IDR color canonical
    head as NeRF-PDF. Returns {'params': ...}."""
    th = "tpose_human."
    params = {
        "bw_field": _bw_field(state),
        "nerf_network": {"layers": _wn_layers(state, th + "nerf_network.")},
        "color_network": _wn_color(state, th + "color_network."),
    }
    if any(k.startswith("novel_pose_bw.") for k in state):
        params["novel_pose_bw"] = _bw_field(state, "novel_pose_bw.")
    return {"params": params}


def convert_aligned_pbw(state: dict) -> dict:
    """Reference aligned_aninerf_pbw_network state dict -> AlignedPBW
    params (models/aligned.py). The bw MLP is pose-vector-conditioned
    (input 63 PE + 72 poses; aligned_aninerf_pbw_network.py:46-61) so it
    carries no latent table; the reference's `bw_latent` embedding is
    dead code there (only reachable via the never-called
    `get_bw_feature`, :38-44) and is skipped. Stage-2 is unreachable in
    the reference PBW class — `self.novel_pose_bw` is referenced
    (:165-167) but never constructed — so no novel-pose params can
    exist in a real checkpoint."""
    th = "tpose_human."
    params = {
        "bw_field": {"mlp": _skip_mlp(state, "bw_linears", "bw_fc")},
        "nerf_network": {"layers": _wn_layers(state, th + "nerf_network.")},
        "color_network": _wn_color(state, th + "color_network."),
    }
    return {"params": params}


def convert_aligned_smpl(state: dict) -> dict:
    """Reference aligned_aninerf_smpl_network state dict -> AlignedSMPL
    params (models/aligned.py): pure SMPL-weight warp, so only the
    canonical geometric NeRF + IDR color head carry weights. The
    reference's `resd_latent` embedding (:19) is dead (its only
    consumer, `calculate_residual_deformation` at :125, is undefined in
    that file) and is skipped."""
    th = "tpose_human."
    return {
        "params": {
            "nerf_network": {"layers": _wn_layers(state, th + "nerf_network.")},
            "color_network": _wn_color(state, th + "color_network."),
        }
    }


def convert_aligned_lbw_pdf(state: dict) -> dict:
    """Reference aligned_aninerf_lbw_pdf_network state dict ->
    AlignedLBWPDF params (models/aligned.py): frame-latent blend-weight
    field AND a poses-conditioned displacement MLP
    (aligned_aninerf_lbw_pdf_network.py:19-42; `resd_latent` is dead in
    the forward path like NeRF-PDF's and skipped), with the shared
    geometric NeRF + IDR color canonical head."""
    th = "tpose_human."
    params = {
        "bw_field": _bw_field(state),
        "resd_field": {"mlp": _skip_mlp(state, "resd_linears", "resd_fc")},
        "nerf_network": {"layers": _wn_layers(state, th + "nerf_network.")},
        "color_network": _wn_color(state, th + "color_network."),
    }
    if any(k.startswith("novel_pose_bw.") for k in state):
        params["novel_pose_bw"] = _bw_field(state, "novel_pose_bw.")
    return {"params": params}


def convert_sdf_pdf(state: dict, n_sdf_layers: int = 9) -> dict:
    """Reference anisdf_pdf_network state dict -> SDFPDF params
    (models/pdf.py). Returns the {'params': ...} tree."""
    th = "tpose_human."
    layers = []
    for l in range(n_sdf_layers):
        pre = f"{th}sdf_network.lin{l}."
        layers.append(
            weight_norm_to_wn(
                state[pre + "weight_v"], state[pre + "weight_g"],
                state[pre + "bias"],
            )
        )
    color = {
        "color_latent": {
            "embedding": state[th + "color_network.color_latent.weight"]
        },
    }
    for l in range(5):
        pre = f"{th}color_network.lin{l}."
        color[f"lin{l}"] = {
            "wn": weight_norm_to_wn(
                state[pre + "weight_v"], state[pre + "weight_g"],
                state[pre + "bias"],
            )
        }
    params = {
        "resd_field": {"mlp": _skip_mlp(state, "resd_linears", "resd_fc")},
        "sdf_network": {"layers": layers},
        "beta_network": {"beta": np.asarray(state[th + "beta_network.beta"]).reshape(())},
        "color_network": color,
    }
    return {"params": params}


def convert_neus_pdf(state: dict, n_sdf_layers: int = 9) -> dict:
    """Reference anisdf_neus_pdf_network state dict -> NeuSPDF params
    (models/pdf.py). Identical to SDF-PDF except the learnable scalar is
    the NeuS `variance_network.variance` (anisdf_neus_pdf_network.py:
    373-383) instead of the VolSDF beta."""
    th = "tpose_human."
    params = {
        "resd_field": {"mlp": _skip_mlp(state, "resd_linears", "resd_fc")},
        "sdf_network": {"layers": _wn_layers(state, th + "sdf_network.",
                                             n_sdf_layers)},
        "variance_network": {
            "variance": np.asarray(
                state[th + "variance_network.variance"]
            ).reshape(())
        },
        "color_network": _wn_color(state, th + "color_network."),
    }
    return {"params": params}


# ------------------------------------------------------------ baselines
def conv2d_to_flax(w: np.ndarray) -> np.ndarray:
    """torch Conv2d weight (out, in, kh, kw) -> flax (kh, kw, in, out)."""
    return np.transpose(np.asarray(w), (2, 3, 1, 0))


def _torch_bn(state: dict, prefix: str) -> dict:
    """nn.BatchNorm2d tensors -> baselines/unet.py TorchBatchNorm params
    (running stats land in `mean`/`var` — build the model with
    frozen_stats=True to serve them, torch eval semantics)."""
    return {
        "scale": np.asarray(state[prefix + ".weight"]),
        "bias": np.asarray(state[prefix + ".bias"]),
        "mean": np.asarray(state[prefix + ".running_mean"]),
        "var": np.asarray(state[prefix + ".running_var"]),
    }


def _gated_conv(state: dict, prefix: str) -> dict:
    """unet_parts.gated_conv (conv2 + conv2_gate)."""
    return {
        "conv": {
            "kernel": conv2d_to_flax(state[prefix + ".conv2.weight"]),
            "bias": np.asarray(state[prefix + ".conv2.bias"]),
        },
        "gate": {
            "kernel": conv2d_to_flax(state[prefix + ".conv2_gate.weight"]),
            "bias": np.asarray(state[prefix + ".conv2_gate.bias"]),
        },
    }


def _double_conv(state: dict, prefix: str) -> dict:
    """unet_parts.double_conv Sequential [gated, bn, relu, gated, bn,
    relu] -> DoubleConv {gc0, bn0, gc1, bn1}."""
    return {
        "gc0": _gated_conv(state, prefix + ".0"),
        "bn0": _torch_bn(state, prefix + ".1"),
        "gc1": _gated_conv(state, prefix + ".3"),
        "bn1": _torch_bn(state, prefix + ".4"),
    }


def convert_nhr_unet(state: dict, prefix: str = "unet.") -> dict:
    """lib/networks/nhr/unet_model.UNet -> baselines/unet.UNet params.

    Layout: inc -> inconv.conv (double_conv), down{k} -> mpconv.2 (the
    .1 slot is the parameterless lpf Downsample), up{k} -> conv, plus
    the summed 1x1 + 3x3 outconv head (unet_parts.py:119-127)."""
    p = prefix
    out = {"inc": _double_conv(state, p + "inc.conv.conv")}
    for k in range(1, 5):
        out[f"down{k}"] = {
            "conv": _double_conv(state, p + f"down{k}.mpconv.2.conv")
        }
    for k in range(1, 5):
        out[f"up{k}"] = {
            "conv": _double_conv(state, p + f"up{k}.conv.conv")
        }
    out["outc"] = {
        "kernel": conv2d_to_flax(state[p + "outc.conv.weight"]),
        "bias": np.asarray(state[p + "outc.conv.bias"]),
    }
    out["outc2"] = {
        "kernel": conv2d_to_flax(state[p + "outc.conv2.weight"]),
        "bias": np.asarray(state[p + "outc.conv2.bias"]),
    }
    return out


def convert_nt(state: dict) -> dict:
    """lib/networks/nt Network -> baselines/nt.NT params.

    Texture levels are (1, C, A, B) grid_sample volumes whose grid
    x-coordinate indexes the LAST torch axis; transposed to our
    (A, B, C) layout the last torch axis becomes our W axis, which is
    exactly what core/grid.grid_bilerp's uv[..., 0] indexes."""
    params = {
        "texture": {
            f"layer{i}": np.transpose(
                np.asarray(state[f"texture.layer{i}"])[0], (1, 2, 0)
            )
            for i in range(1, 5)
        },
        "unet": convert_nhr_unet(state, "unet."),
    }
    return {"params": params}


def _shared_mlp(state: dict, prefix: str, n_layers: int) -> dict:
    """pt_utils.SharedMLP (Conv2d k=1 no-bias + BatchNorm2d wrapper) ->
    _PointMLP {lin{i}, bn{i}}."""
    out = {}
    for i in range(n_layers):
        w = np.asarray(state[f"{prefix}layer{i}.conv.weight"])  # (o,i,1,1)
        out[f"lin{i}"] = {"kernel": w[:, :, 0, 0].T}
        out[f"bn{i}"] = _torch_bn(state, f"{prefix}layer{i}.bn.bn")
    return out


def convert_pointnet2(state: dict, prefix: str = "",
                      n_sa: int = 4, n_scales: int = 2,
                      mlp_depth: int = 2) -> dict:
    """lib/networks/pointnet2 Pointnet2MSG -> baselines/pointnet2_msg
    .PointNet2MSG params (SA_modules.{k}.mlps.{s} -> sa{k}/scale{s};
    FP_modules.{k}.mlp -> fp{k}/mlp)."""
    params = {}
    for k in range(n_sa):
        sa = {}
        for s in range(n_scales):
            sa[f"scale{s}"] = _shared_mlp(
                state, f"{prefix}SA_modules.{k}.mlps.{s}.", mlp_depth
            )
        params[f"sa{k}"] = sa
    for k in range(n_sa):
        params[f"fp{k}"] = {
            "mlp": _shared_mlp(
                state, f"{prefix}FP_modules.{k}.mlp.", mlp_depth
            )
        }
    return {"params": params}


def convert_nhr(state: dict, feature_dim: int = 18) -> dict:
    """lib/networks/nhr Network -> baselines/nhr.NHR params (PARTIAL).

    Importable subtrees: the Pointnet2MSG encoder (`pointnet.`), the
    refiner UNet inside PCPRender (`render.unet.`) and the PCPR default
    feature vector (`pcpr_parameters.default_features`, (fdim, 1) ->
    (fdim,) — the miss-pixel fill). The PCPR CUDA splatter itself has
    no learnable tensors beyond these; our scatter-min rasterizer
    (ops/rasterize.py) replaces it exactly at the interface, so this
    import is complete for everything the reference checkpoint learns.
    """
    return {
        "params": {
            "pointnet": convert_pointnet2(state, prefix="pointnet.")[
                "params"
            ],
            "unet": convert_nhr_unet(state, prefix="render.unet."),
            "default_features": np.asarray(
                state["pcpr_parameters.default_features"]
            ).reshape(feature_dim),
        }
    }
