"""Image visualizers writing the reference's output layout.

Reference: lib/visualizers/if_nerf.py (eval-view pred/gt pairs),
if_nerf_demo.py (novel-view frames under data/novel_view/<exp>/frameXXXX),
if_nerf_perform.py (pose-sequence frames under data/perform/<exp>).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _scatter_image(rgb, mask_at_box, H, W):
    img = np.zeros((H, W, 3), np.float32)
    img[mask_at_box.reshape(H, W)] = rgb
    return img


def _write(path, img_rgb01):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    cv2.imwrite(path, (np.clip(img_rgb01[..., ::-1], 0, 1) * 255).astype(np.uint8))


class ImageVisualizer:
    """Eval-view pred/gt dump (if_nerf.py:16-51)."""

    def __init__(self, result_dir: str):
        self.result_dir = result_dir

    def visualize(self, rgb_pred, rgb_gt, mask_at_box, H, W, frame_index, view_index):
        pred = _scatter_image(rgb_pred, mask_at_box, H, W)
        base = os.path.join(self.result_dir, "vis")
        _write(f"{base}/frame{frame_index:04d}_view{view_index:04d}.png", pred)
        if rgb_gt is not None:
            gt = _scatter_image(rgb_gt, mask_at_box, H, W)
            _write(f"{base}/frame{frame_index:04d}_view{view_index:04d}_gt.png", gt)


class NovelViewVisualizer:
    """data/novel_view/<exp>/frame_<i>/<view>.png (if_nerf_demo.py:15-37)."""

    def __init__(self, exp_name: str, out_root: str = "data/novel_view"):
        self.dir = os.path.join(out_root, exp_name)

    def visualize(self, rgb_pred, mask_at_box, H, W, frame_index, view_index,
                  depth=None, acc=None):
        img = _scatter_image(rgb_pred, mask_at_box, H, W)
        frame_dir = os.path.join(self.dir, f"frame_{frame_index:04d}")
        _write(os.path.join(frame_dir, f"{view_index:04d}.png"), img)
        # optional accumulated depth/opacity dumps (if_nerf_demo.py:26-35)
        if depth is not None:
            d = np.zeros((H, W), np.float32)
            d[mask_at_box.reshape(H, W)] = np.asarray(depth).reshape(-1)
            np.save(
                os.path.join(frame_dir, f"{view_index:04d}_depth.npy"), d
            )
        if acc is not None:
            a = np.zeros((H, W), np.float32)
            a[mask_at_box.reshape(H, W)] = np.asarray(acc).reshape(-1)
            np.save(os.path.join(frame_dir, f"{view_index:04d}_acc.npy"), a)


class PoseSequenceVisualizer:
    """data/perform/<exp>/frame_<i>_view_<v>.png (if_nerf_perform.py)."""

    def __init__(self, exp_name: str, out_root: str = "data/perform"):
        self.dir = os.path.join(out_root, exp_name)

    def visualize(self, rgb_pred, mask_at_box, H, W, frame_index, view_index):
        img = _scatter_image(rgb_pred, mask_at_box, H, W)
        _write(
            os.path.join(self.dir, f"frame{frame_index:04d}_view{view_index:04d}.png"),
            img,
        )
