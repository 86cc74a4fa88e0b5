"""Image-quality evaluation: PSNR + SSIM with the reference's exact
protocol.

Reference: lib/evaluators/if_nerf.py — PSNR over the masked ray set
(:15-18), SSIM on the bounding-rect crop of the scattered image via
skimage's `structural_similarity(..., multichannel=True)` (:20-58).
skimage isn't available in this image, so `ssim_metric` reimplements the
exact algorithm it runs for float inputs: 7x7 uniform filter,
K1=0.01/K2=0.03, and the legacy float dtype-range default data_range=2.0
(skimage uses dtype_range[float] = (-1, 1) when data_range is omitted —
the reference relies on that default, so parity requires it).
"""

from __future__ import annotations

import os

import numpy as np

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def psnr_metric(img_pred, img_gt):
    mse = np.mean((img_pred - img_gt) ** 2)
    return -10 * np.log(mse) / np.log(10)


def _uniform_filter(img, size=7):
    """scipy-free separable uniform filter with reflect padding matching
    scipy.ndimage.uniform_filter defaults."""
    from scipy.ndimage import uniform_filter

    return uniform_filter(img, size=size)


def ssim_single(im1, im2, data_range=2.0, win_size=7, K1=0.01, K2=0.03):
    """skimage structural_similarity for 2-D float images, default args
    (gaussian_weights=False path)."""
    im1 = im1.astype(np.float64)
    im2 = im2.astype(np.float64)
    NP = win_size**2
    cov_norm = NP / (NP - 1)

    ux = _uniform_filter(im1, win_size)
    uy = _uniform_filter(im2, win_size)
    uxx = _uniform_filter(im1 * im1, win_size)
    uyy = _uniform_filter(im2 * im2, win_size)
    uxy = _uniform_filter(im1 * im2, win_size)
    vx = cov_norm * (uxx - ux * ux)
    vy = cov_norm * (uyy - uy * uy)
    vxy = cov_norm * (uxy - ux * uy)

    R = data_range
    C1 = (K1 * R) ** 2
    C2 = (K2 * R) ** 2
    A1 = 2 * ux * uy + C1
    A2 = 2 * vxy + C2
    B1 = ux**2 + uy**2 + C1
    B2 = vx + vy + C2
    S = (A1 * A2) / (B1 * B2)

    pad = (win_size - 1) // 2
    return S[pad:-pad, pad:-pad].mean()


def ssim_metric(img_pred, img_gt, data_range=2.0):
    """Multichannel SSIM: per-channel mean (skimage multichannel=True)."""
    if img_pred.ndim == 2:
        return ssim_single(img_pred, img_gt, data_range)
    return np.mean(
        [
            ssim_single(img_pred[..., c], img_gt[..., c], data_range)
            for c in range(img_pred.shape[-1])
        ]
    )


class ImageEvaluator:
    """Accumulating evaluator with the reference's output layout
    (metrics.npy + comparison PNG pairs)."""

    def __init__(self, result_dir: str):
        self.result_dir = result_dir
        self.mse = []
        self.psnr = []
        self.ssim = []

    def evaluate(self, rgb_pred, rgb_gt, mask_at_box, H, W,
                 frame_index=0, view_index=0, save_images=True,
                 timing=None):
        """rgb_pred/rgb_gt: (n_rays, 3) for the True entries of
        mask_at_box (flattened H*W bools). `timing`: optional dict
        accumulating per-stage seconds (png_s / ssim_s) for the CLI
        wall-time decomposition (engine.run_evaluate eval_timing)."""
        import time as _time

        if rgb_gt.sum() == 0:
            return None
        mse = float(np.mean((rgb_pred - rgb_gt) ** 2))
        psnr = float(psnr_metric(rgb_pred, rgb_gt))

        mab = mask_at_box.reshape(H, W)
        img_pred = np.zeros((H, W, 3))
        img_pred[mab] = rgb_pred
        img_gt = np.zeros((H, W, 3))
        img_gt[mab] = rgb_gt

        if save_images and cv2 is not None:
            t0 = _time.time()
            comp = os.path.join(self.result_dir, "comparison")
            os.makedirs(comp, exist_ok=True)
            cv2.imwrite(
                f"{comp}/frame{frame_index:04d}_view{view_index:04d}.png",
                np.clip(img_pred[..., ::-1] * 255, 0, 255).astype(np.uint8),
            )
            cv2.imwrite(
                f"{comp}/frame{frame_index:04d}_view{view_index:04d}_gt.png",
                np.clip(img_gt[..., ::-1] * 255, 0, 255).astype(np.uint8),
            )
            if timing is not None:
                timing["png_s"] = timing.get("png_s", 0.0) + (
                    _time.time() - t0
                )

        # bbox crop before SSIM (if_nerf.py:51-56)
        t0 = _time.time()
        ys, xs = np.where(mab)
        y0, y1 = ys.min(), ys.max() + 1
        x0, x1 = xs.min(), xs.max() + 1
        ssim = float(ssim_metric(img_pred[y0:y1, x0:x1], img_gt[y0:y1, x0:x1]))
        if timing is not None:
            timing["ssim_s"] = timing.get("ssim_s", 0.0) + (_time.time() - t0)

        self.mse.append(mse)
        self.psnr.append(psnr)
        self.ssim.append(ssim)
        return {"mse": mse, "psnr": psnr, "ssim": ssim}

    def summarize(self):
        os.makedirs(self.result_dir, exist_ok=True)
        metrics = {"mse": self.mse, "psnr": self.psnr, "ssim": self.ssim}
        np.save(os.path.join(self.result_dir, "metrics.npy"), metrics)
        out = {
            "mse": float(np.mean(self.mse)) if self.mse else float("nan"),
            "psnr": float(np.mean(self.psnr)) if self.psnr else float("nan"),
            "ssim": float(np.mean(self.ssim)) if self.ssim else float("nan"),
        }
        print(f"the results are saved at {self.result_dir}")
        for k, v in out.items():
            print(f"{k}: {v}")
        self.mse, self.psnr, self.ssim = [], [], []
        return out
