"""Debug renders of the SMPL skeleton over dataset frames.

Mirrors tools/render_skeleton.py of the reference: project the posed
joints into each camera and draw the kinematic-tree bones on top of the
frame image (or a black canvas), writing
`skeleton/<frame>_<cam>.png`.

Usage:
  python tools/render_skeleton.py --data_dir data/zju_mocap --humans CoreView_313
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from animatable_nerf_tpu.core.skeleton import rigid_transforms, batch_rodrigues


def render_human(data_dir, human, params_dir="params", ratio: float = 1.0,
                 max_frames: int = -1):
    import cv2

    root = os.path.join(data_dir, human)
    annots = np.load(
        os.path.join(root, "annots.npy"), allow_pickle=True
    ).item()
    cams = annots["cams"]
    joints = np.load(os.path.join(root, "lbs", "joints.npy")).astype(
        np.float32
    )
    parents = np.load(os.path.join(root, "lbs", "parents.npy"))
    out_dir = os.path.join(root, "skeleton")
    os.makedirs(out_dir, exist_ok=True)

    pdir = os.path.join(root, params_dir)
    frame_ids = sorted(
        int(os.path.splitext(nm)[0])
        for nm in os.listdir(pdir)
        if os.path.splitext(nm)[0].isdigit()
    )
    if max_frames > 0:
        frame_ids = frame_ids[:max_frames]

    for i in frame_ids:
        prm = np.load(
            os.path.join(pdir, f"{i}.npy"), allow_pickle=True
        ).item()
        poses = np.asarray(prm["poses"], np.float32).reshape(-1, 3)[:24]
        Rh = np.asarray(prm["Rh"], np.float32).reshape(3)
        Th = np.asarray(prm["Th"], np.float32).reshape(1, 3)
        Rw = np.asarray(batch_rodrigues(Rh[None]))[0]
        _, posed = rigid_transforms(poses, joints, parents, return_joints=True)
        world = np.asarray(posed) @ Rw.T + Th

        for c in range(len(cams["K"])):
            K = np.asarray(cams["K"][c], np.float64).copy()
            K[:2] *= ratio
            R = np.asarray(cams["R"][c], np.float64)
            T = np.asarray(cams["T"][c], np.float64).reshape(3, 1) / 1000.0
            cam_pts = world @ R.T + T.T
            pix = cam_pts @ K.T
            uv = (pix[:, :2] / np.maximum(pix[:, 2:], 1e-8)).astype(int)
            H = int(round(K[1, 2] * 2))
            W = int(round(K[0, 2] * 2))
            canvas = np.zeros((H, W, 3), np.uint8)
            for j in range(1, len(parents)):
                p = int(parents[j])
                cv2.line(canvas, tuple(uv[p]), tuple(uv[j]), (0, 255, 0), 2)
            for j in range(len(uv)):
                cv2.circle(canvas, tuple(uv[j]), 3, (0, 0, 255), -1)
            cv2.imwrite(os.path.join(out_dir, f"{i}_{c}.png"), canvas)
    return out_dir


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--humans", nargs="+", required=True)
    ap.add_argument("--params", default="params")
    ap.add_argument("--ratio", type=float, default=1.0)
    ap.add_argument("--max_frames", type=int, default=-1)
    args = ap.parse_args(argv)
    for human in args.humans:
        out = render_human(
            args.data_dir, human, args.params, args.ratio, args.max_frames
        )
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
