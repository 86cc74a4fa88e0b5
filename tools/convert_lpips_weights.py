"""Convert torch LPIPS weights to the .npz format evaluators/lpips.py loads.

The reference's dangling `run.py --type lpips` entry (run.py:138-140)
implies the standard LPIPS checkpoints; those are distributed as two
torch files neither repo may bundle:

  1. the torchvision backbone state_dict
     (alexnet-owt-*.pth / vgg16-*.pth: keys `features.<i>.weight/bias`)
  2. the LPIPS linear calibration weights
     (lpips weights/v0.1/{alex,vgg}.pth: keys `lin<i>.model.1.weight`)

Usage:
    python tools/convert_lpips_weights.py --arch alex \
        --backbone ~/alexnet-owt-7be5be79.pth \
        --lin ~/lpips_alex_v0.1.pth \
        --out data/lpips_alex.npz
Then score an eval run:
    python run.py --type lpips --cfg_file configs/<cfg>.yaml \
        exp_name <exp> lpips_weights data/lpips_alex.npz
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from animatable_nerf_tpu.evaluators.lpips import SPECS  # noqa: E402

# torchvision `features.<idx>` module indices of the conv layers
BACKBONE_CONV_IDX = {
    "alex": [0, 3, 6, 8, 10],
    "vgg": [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28],
}


def convert(arch: str, backbone_pth: str, lin_pth: str) -> dict:
    import torch

    out = {"arch": arch}

    bb = torch.load(backbone_pth, map_location="cpu", weights_only=True)
    if hasattr(bb, "state_dict"):
        bb = bb.state_dict()
    for ci, mi in enumerate(BACKBONE_CONV_IDX[arch]):
        w = bb[f"features.{mi}.weight"].numpy()  # OIHW
        b = bb[f"features.{mi}.bias"].numpy()
        out[f"conv{ci}_w"] = np.transpose(w, (2, 3, 1, 0)).astype(np.float32)
        out[f"conv{ci}_b"] = b.astype(np.float32)

    lin = torch.load(lin_pth, map_location="cpu", weights_only=True)
    if hasattr(lin, "state_dict"):
        lin = lin.state_dict()
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.weight",
                    f"lin{i}.weight"):
            if key in lin:
                w = lin[key].numpy().reshape(-1)  # (1,C,1,1) -> (C,)
                break
        else:
            raise KeyError(f"no lin{i} weight found in {lin_pth}: {sorted(lin)}")
        out[f"lin{i}"] = np.maximum(w, 0.0).astype(np.float32)

    # structural check against the spec
    n_convs = sum(1 for op in SPECS[arch] if op[0] == "conv")
    assert n_convs == len(BACKBONE_CONV_IDX[arch])
    return out


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--arch", choices=("alex", "vgg"), default="alex")
    ap.add_argument("--backbone", required=True,
                    help="torchvision backbone state_dict .pth")
    ap.add_argument("--lin", required=True,
                    help="LPIPS linear calibration .pth (weights/v0.1/*)")
    ap.add_argument("--out", required=True, help="output .npz path")
    args = ap.parse_args()

    params = convert(args.arch, args.backbone, args.lin)
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    np.savez(args.out, **params)
    n = sum(v.size for k, v in params.items() if k != "arch")
    print(f"wrote {args.out}: arch={args.arch}, {n/1e6:.1f}M params")


if __name__ == "__main__":
    main()
