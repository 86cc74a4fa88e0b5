"""Export this framework's flax params back to reference-format PyTorch
checkpoints (the inverse of compat/torch_import.py) — VERDICT-r3 item 1.

Why: the strongest cross-framework parity instrument is letting the
REFERENCE's own evaluation stack (`load_network`,
lib/utils/net_utils.py:357-396 -> tpose_renderer chunk loop ->
lib/evaluators/if_nerf.py) score a checkpoint TRAINED HERE. That needs a
`.pth` whose `net` state dict strict-loads into the reference module.

Tensor conventions (inverse of torch_import.py):
  flax Dense kernel (in, out)      -> torch Linear weight (out, in)
                                   -> torch Conv1d(k=1) weight (out, in, 1)
  our WN {v (in, out), g (out,), b} -> weight_v (out, in), weight_g
                                       (out, 1), bias  (dim=0 weight_norm)

The reference modules carry a few DEAD parameters their forward paths
never read (e.g. aligned_aninerf_pbw_network.py's `bw_latent`, the
`resd_latent` embeddings of the pdf/lbw_pdf/smpl files) which
torch_import deliberately skips — `load_network` strict-loads, so
`export_state_dict(..., template=ref_net.state_dict())` passes the
template's values through for any key this exporter does not produce
(and reshapes scalar-vs-(1,)-shaped tensors to the template's shape).
"""

from __future__ import annotations

import numpy as np

__all__ = [
    "export_state_dict",
    "save_reference_checkpoint",
    "EXPORTERS",
]


def _np(a):
    return np.asarray(a)


def dense_to_conv1d(kernel) -> np.ndarray:
    """flax Dense kernel (in, out) -> torch Conv1d(k=1) weight (out, in, 1)."""
    return np.ascontiguousarray(_np(kernel).T)[:, :, None]


def dense_to_linear(kernel) -> np.ndarray:
    """flax Dense kernel (in, out) -> torch Linear weight (out, in)."""
    return np.ascontiguousarray(_np(kernel).T)


def wn_to_weight_norm(wn: dict, prefix: str, out: dict):
    """our {v, g, b} -> torch weight_norm(Linear) triplet."""
    out[prefix + "weight_v"] = dense_to_linear(wn["v"])
    out[prefix + "weight_g"] = np.ascontiguousarray(
        _np(wn["g"]).reshape(-1, 1)
    )
    out[prefix + "bias"] = _np(wn["b"])


def _skip_mlp_out(p: dict, prefix_linears: str, prefix_fc: str, out: dict,
                  depth: int = 8):
    for i in range(depth):
        out[f"{prefix_linears}.{i}.weight"] = dense_to_conv1d(
            p[f"lin{i}"]["kernel"]
        )
        out[f"{prefix_linears}.{i}.bias"] = _np(p[f"lin{i}"]["bias"])
    out[f"{prefix_fc}.weight"] = dense_to_conv1d(p["out"]["kernel"])
    out[f"{prefix_fc}.bias"] = _np(p["out"]["bias"])


def _bw_field_out(p: dict, out: dict, prefix: str = ""):
    if "latent" in p:
        out[f"{prefix}bw_latent.weight"] = _np(p["latent"]["embedding"])
    _skip_mlp_out(p["mlp"], f"{prefix}bw_linears", f"{prefix}bw_fc", out)


def _wn_layers_out(layers, prefix: str, out: dict):
    for l, wn in enumerate(layers):
        wn_to_weight_norm(wn, f"{prefix}lin{l}.", out)


def _wn_color_out(p: dict, prefix: str, out: dict):
    out[prefix + "color_latent.weight"] = _np(
        p["color_latent"]["embedding"]
    )
    for l in range(5):
        wn_to_weight_norm(p[f"lin{l}"]["wn"], f"{prefix}lin{l}.", out)


# --------------------------------------------------------- per family
def export_aninerf(params: dict) -> dict:
    """AniNeRF params -> tpose_nerf_network state dict (inverse of
    torch_import.convert_aninerf)."""
    p = params["params"] if "params" in params else params
    out = {}
    _bw_field_out(p["bw_field"], out)
    th = "tpose_human."
    tp = p["tpose_human"]
    for i in range(8):
        out[f"{th}pts_linears.{i}.weight"] = dense_to_conv1d(
            tp[f"lin{i}"]["kernel"]
        )
        out[f"{th}pts_linears.{i}.bias"] = _np(tp[f"lin{i}"]["bias"])
    for head in ("alpha_fc", "feature_fc", "latent_fc", "view_fc", "rgb_fc"):
        out[f"{th}{head}.weight"] = dense_to_conv1d(tp[head]["kernel"])
        out[f"{th}{head}.bias"] = _np(tp[head]["bias"])
    out[f"{th}nf_latent.weight"] = _np(tp["nf_latent"]["embedding"])
    if "novel_pose_bw" in p:
        _bw_field_out(p["novel_pose_bw"], out, "novel_pose_bw.")
    return out


def export_nerf_pdf(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    out = {}
    _skip_mlp_out(p["resd_field"]["mlp"], "resd_linears", "resd_fc", out)
    th = "tpose_human."
    _wn_layers_out(p["nerf_network"]["layers"], th + "nerf_network.", out)
    _wn_color_out(p["color_network"], th + "color_network.", out)
    return out


def export_aligned_lbw(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    out = {}
    _bw_field_out(p["bw_field"], out)
    th = "tpose_human."
    _wn_layers_out(p["nerf_network"]["layers"], th + "nerf_network.", out)
    _wn_color_out(p["color_network"], th + "color_network.", out)
    if "novel_pose_bw" in p:
        _bw_field_out(p["novel_pose_bw"], out, "novel_pose_bw.")
    return out


def export_aligned_pbw(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    out = {}
    _skip_mlp_out(p["bw_field"]["mlp"], "bw_linears", "bw_fc", out)
    th = "tpose_human."
    _wn_layers_out(p["nerf_network"]["layers"], th + "nerf_network.", out)
    _wn_color_out(p["color_network"], th + "color_network.", out)
    return out


def export_aligned_smpl(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    out = {}
    th = "tpose_human."
    _wn_layers_out(p["nerf_network"]["layers"], th + "nerf_network.", out)
    _wn_color_out(p["color_network"], th + "color_network.", out)
    return out


def export_aligned_lbw_pdf(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    out = {}
    _bw_field_out(p["bw_field"], out)
    _skip_mlp_out(p["resd_field"]["mlp"], "resd_linears", "resd_fc", out)
    th = "tpose_human."
    _wn_layers_out(p["nerf_network"]["layers"], th + "nerf_network.", out)
    _wn_color_out(p["color_network"], th + "color_network.", out)
    if "novel_pose_bw" in p:
        _bw_field_out(p["novel_pose_bw"], out, "novel_pose_bw.")
    return out


def export_sdf_pdf(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    out = {}
    _skip_mlp_out(p["resd_field"]["mlp"], "resd_linears", "resd_fc", out)
    th = "tpose_human."
    _wn_layers_out(p["sdf_network"]["layers"], th + "sdf_network.", out)
    out[th + "beta_network.beta"] = _np(p["beta_network"]["beta"]).reshape(())
    _wn_color_out(p["color_network"], th + "color_network.", out)
    return out


def export_neus_pdf(params: dict) -> dict:
    p = params["params"] if "params" in params else params
    out = {}
    _skip_mlp_out(p["resd_field"]["mlp"], "resd_linears", "resd_fc", out)
    th = "tpose_human."
    _wn_layers_out(p["sdf_network"]["layers"], th + "sdf_network.", out)
    out[th + "variance_network.variance"] = _np(
        p["variance_network"]["variance"]
    ).reshape(())
    _wn_color_out(p["color_network"], th + "color_network.", out)
    return out


# same family keys as models/registry + tools/import_torch_checkpoint
EXPORTERS = {
    "aninerf": export_aninerf,
    "nerf_pdf": export_nerf_pdf,
    "aligned_lbw": export_aligned_lbw,
    "aligned_pbw": export_aligned_pbw,
    "aligned_smpl": export_aligned_smpl,
    "aligned_lbw_pdf": export_aligned_lbw_pdf,
    "sdf_pdf": export_sdf_pdf,
    "neus_pdf": export_neus_pdf,
}


def export_state_dict(family: str, params: dict, template: dict = None,
                      num_train_frame: int = None):
    """flax params -> reference state dict (numpy values).

    `template`: the target reference module's own state_dict() — keys the
    exporter does not produce (dead params torch_import skips) are passed
    through from it, and every exported tensor is reshaped to the
    template's shape (asserting equal element counts) so
    `load_state_dict(strict=True)` succeeds.

    `num_train_frame`: sizes the synthesized forward-dead `bw_latent`
    for the template-less aligned_pbw export (the reference declares it
    (num_train_frame + 1, 128)); when omitted, falls back to the
    color-latent row count, which is only correct when the config has
    num_latent_code == num_train_frame (true for every shipped yaml)."""
    out = EXPORTERS[family](params)
    if template is not None:
        tdict = {k: _np(v) for k, v in template.items()}
        for k in list(out):
            if k not in tdict:
                raise KeyError(
                    f"exported key {k} not in the reference module's "
                    "state dict"
                )
            want = tdict[k].shape
            if out[k].shape != want:
                assert np.prod(out[k].shape, dtype=int) == np.prod(
                    want, dtype=int
                ), f"{k}: {out[k].shape} vs {want}"
                out[k] = out[k].reshape(want)
        for k, v in tdict.items():
            if k not in out:
                out[k] = v  # forward-dead parameter (see module docstring)
    else:
        # no template (e.g. exporting a TPU-trained checkpoint for the
        # reference CLI to strict-load, tools/parity_protocol.py):
        # synthesize the reference's FORWARD-DEAD `resd_latent`
        # embedding — declared by the pdf/lbw_pdf/smpl/sdf/neus modules
        # (e.g. anisdf_pdf_network.py:19, (num_latent_code, 128)) but
        # never read in any forward path, so zeros are exact. Row count
        # mirrors the live color latent (both are cfg.num_latent_code).
        if family in ("nerf_pdf", "aligned_lbw_pdf", "aligned_smpl",
                      "sdf_pdf", "neus_pdf"):
            rows = out["tpose_human.color_network.color_latent.weight"].shape[0]
            out.setdefault(
                "resd_latent.weight", np.zeros((rows, 128), np.float32)
            )
        if family == "aligned_pbw":
            # the pbw ablation's bw field is pose-conditioned; its
            # declared frame-latent table (aligned_aninerf_pbw_network.py
            # :17, (num_train_frame + 1, 128)) is forward-dead
            if num_train_frame is None:
                # assumes num_latent_code == num_train_frame (see
                # docstring); pass num_train_frame to lift the assumption
                num_train_frame = out[
                    "tpose_human.color_network.color_latent.weight"
                ].shape[0]
            out.setdefault(
                "bw_latent.weight",
                np.zeros((num_train_frame + 1, 128), np.float32),
            )
    return out


def save_reference_checkpoint(path: str, family: str, params: dict,
                              epoch: int = 0, template: dict = None,
                              num_train_frame: int = None):
    """Write a reference-format `.pth` ({'net': state_dict, 'epoch': N})
    that net_utils.load_network (:357-396) loads directly. `optim`/
    `scheduler`/`recorder` states are NOT written — load_network never
    reads them (only load_model does, for resuming reference training)."""
    import torch

    state = {
        # copy=True: jax array buffers are non-writable and torch warns
        # on zero-copy views of them
        k: torch.as_tensor(np.array(v, copy=True))
        for k, v in export_state_dict(
            family, params, template, num_train_frame=num_train_frame
        ).items()
    }
    torch.save({"net": state, "epoch": int(epoch)}, path)
    return path
