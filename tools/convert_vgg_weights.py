"""Convert torch VGG weights to the .npz train/perceptual.py loads.

Two targets, matching the two VGG losses of the reference's lib/losses:

  * `vgg19_head` — the first four convs of torchvision vgg19.features
    (keys `features.{0,2,5,7}.weight/bias`), which is all the NHR/NT
    Perceptual_loss uses (lib/losses/nhr_perceptual_loss.py:26-55).
    Source: a torchvision vgg19 state_dict .pth (user-supplied; the
    repo bundles no ImageNet weights).
  * `vgg16_gray` — the reference's custom 1-channel VGG16
    (lib/losses/vgg.py make_layers cfg 'D': keys like
    `conv1_1.weight`, optionally under a `vgg_layers.`/`features.`
    prefix), used by VGGPerceptualLoss with the CelebA checkpoint
    (lib/losses/perceptual_loss.py:26).

Usage:
    python tools/convert_vgg_weights.py --arch vgg19_head \
        --pth ~/vgg19-dcbb9e9d.pth --out data/vgg19_head.npz
Then train the NHR/NT baselines with the exact reference objective:
    python train_net.py --cfg_file configs/baselines/nhr_s9p.yaml \
        train.vgg_weights data/vgg19_head.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from animatable_nerf_tpu.train.perceptual import (  # noqa: E402
    VGG16_GRAY_BLOCKS,
    VGG19_HEAD_CONVS,
)

# torchvision vgg19.features module indices of the four head convs
VGG19_HEAD_IDX = (0, 2, 5, 7)


def _state_dict(pth: str) -> dict:
    import torch

    sd = torch.load(pth, map_location="cpu", weights_only=False)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]
    return sd


def _oihw_to_hwio(w: np.ndarray) -> np.ndarray:
    return np.ascontiguousarray(np.transpose(w, (2, 3, 1, 0)))


def convert_vgg19_head(pth: str) -> dict:
    sd = _state_dict(pth)
    out = {"arch": "vgg19_head"}
    for ci, mi in enumerate(VGG19_HEAD_IDX):
        w = np.asarray(sd[f"features.{mi}.weight"], np.float32)
        b = np.asarray(sd[f"features.{mi}.bias"], np.float32)
        cin, cout = VGG19_HEAD_CONVS[ci]
        assert w.shape == (cout, cin, 3, 3), (ci, w.shape)
        out[f"conv{ci}_w"] = _oihw_to_hwio(w)
        out[f"conv{ci}_b"] = b
    return out


def convert_vgg16_gray(pth: str) -> dict:
    sd = _state_dict(pth)
    # strip any module prefix down to the conv{i}_{j} names vgg.py's
    # make_layers assigns
    clean = {}
    for k, v in sd.items():
        name = k.split(".")[-2] if k.count(".") >= 1 else k
        kind = k.split(".")[-1]
        clean[f"{name}.{kind}"] = v
    out = {"arch": "vgg16_gray"}
    cin, ci = 1, 0
    for bi, widths in enumerate(VGG16_GRAY_BLOCKS):
        for wi, cout in enumerate(widths):
            w = np.asarray(clean[f"conv{bi + 1}_{wi + 1}.weight"], np.float32)
            b = np.asarray(clean[f"conv{bi + 1}_{wi + 1}.bias"], np.float32)
            assert w.shape == (cout, cin, 3, 3), (bi, wi, w.shape)
            out[f"conv{ci}_w"] = _oihw_to_hwio(w)
            out[f"conv{ci}_b"] = b
            cin = cout
            ci += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", choices=["vgg19_head", "vgg16_gray"],
                    required=True)
    ap.add_argument("--pth", required=True, help="torch checkpoint path")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()
    conv = (convert_vgg19_head if args.arch == "vgg19_head"
            else convert_vgg16_gray)
    out = conv(args.pth)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **out)
    n = sum(v.size for k, v in out.items() if k != "arch")
    print(f"wrote {args.out} ({n / 1e6:.2f}M params, arch {out['arch']})")


if __name__ == "__main__":
    main()
