"""LPIPS perceptual metric (Zhang et al., CVPR 2018) in pure JAX.

The reference's `run.py:138-140` dispatches `--type lpips` to
`tools/calculate_lpips`, which is ABSENT from the reference repository
(a dangling entry, like `animation`/`raster`). This implements the
standard LPIPS metric that entry was meant to expose: backbone conv
features (AlexNet or VGG16 taps), per-pixel unit-normalization across
channels, learned non-negative per-channel calibration weights, spatial
mean, sum over tap layers.

No pretrained weights are bundled (they derive from ImageNet-trained
torchvision models and the LPIPS authors' calibration checkpoints);
convert user-supplied torch weights once with
`tools/convert_lpips_weights.py` and point the `lpips_weights` config
key (or --weights) at the resulting .npz. Scoring runs fine on CPU —
images are small and the backbone is a handful of convs.

Layout notes: everything here is NHWC with HWIO conv kernels (XLA's
preferred CPU/TPU layout); the converter transposes torchvision's OIHW.
"""

from __future__ import annotations

import os
import re

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

# LPIPS ScalingLayer constants (lpips/lpips.py ScalingLayer): inputs in
# [-1, 1] are shifted/scaled into the backbone's expected statistics.
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)

# backbone tap channel widths
ALEX_CHANNELS = (64, 192, 384, 256, 256)
VGG_CHANNELS = (64, 128, 256, 512, 512)

# (out_ch, kernel, stride, pad) per conv; `M` = 3x3/2 max-pool. Taps are
# taken after each ReLU marked `T`.
_ALEX_SPEC = [
    ("conv", 64, 11, 4, 2), ("tap",), ("pool",),
    ("conv", 192, 5, 1, 2), ("tap",), ("pool",),
    ("conv", 384, 3, 1, 1), ("tap",),
    ("conv", 256, 3, 1, 1), ("tap",),
    ("conv", 256, 3, 1, 1), ("tap",), ("pool",),
]
# VGG16 features with LPIPS taps at relu1_2/2_2/3_3/4_3/5_3
_VGG_SPEC = [
    ("conv", 64, 3, 1, 1), ("conv", 64, 3, 1, 1), ("tap",), ("pool2",),
    ("conv", 128, 3, 1, 1), ("conv", 128, 3, 1, 1), ("tap",), ("pool2",),
    ("conv", 256, 3, 1, 1), ("conv", 256, 3, 1, 1), ("conv", 256, 3, 1, 1),
    ("tap",), ("pool2",),
    ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1),
    ("tap",), ("pool2",),
    ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1), ("conv", 512, 3, 1, 1),
    ("tap",), ("pool2",),
]
SPECS = {"alex": _ALEX_SPEC, "vgg": _VGG_SPEC}


def _conv(x, w, b, stride, pad):
    y = lax.conv_general_dilated(
        x, w,
        window_strides=(stride, stride),
        padding=[(pad, pad), (pad, pad)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return y + b


def _maxpool(x, k, s):
    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, k, k, 1), (1, s, s, 1), "VALID"
    )


def backbone_taps(params, x, arch: str):
    """Run the backbone, returning the list of 5 post-ReLU tap
    activations. x: (N, H, W, 3) NHWC in [-1, 1]."""
    x = (x - _SHIFT) / _SCALE
    taps = []
    ci = 0
    for op in SPECS[arch]:
        if op[0] == "conv":
            _, _, k, s, p = op
            x = jax.nn.relu(_conv(x, params[f"conv{ci}_w"], params[f"conv{ci}_b"], s, p))
            ci += 1
        elif op[0] == "tap":
            taps.append(x)
        elif op[0] == "pool":
            x = _maxpool(x, 3, 2)
        elif op[0] == "pool2":
            x = _maxpool(x, 2, 2)
    return taps


def _unit_normalize(x, eps=1e-10):
    """lpips normalize_tensor: unit L2 norm across channels per pixel."""
    n = jnp.sqrt(jnp.sum(x * x, axis=-1, keepdims=True))
    return x / (n + eps)


def lpips_distance(params, img0, img1, arch: str | None = None):
    """LPIPS distance per image pair.

    img0/img1: (N, H, W, 3) float in [0, 1] (converted to the [-1, 1]
    range LPIPS expects). Returns (N,) distances."""
    arch = arch or params.get("arch", "alex")
    a = backbone_taps(params, img0 * 2.0 - 1.0, arch)
    b = backbone_taps(params, img1 * 2.0 - 1.0, arch)
    total = 0.0
    for i, (fa, fb) in enumerate(zip(a, b)):
        d = (_unit_normalize(fa) - _unit_normalize(fb)) ** 2
        w = params[f"lin{i}"]  # (C,) non-negative calibration weights
        total = total + jnp.mean(jnp.sum(d * w, axis=-1), axis=(-2, -1))
    return total


def load_lpips(path: str) -> dict:
    """Load a converted .npz (tools/convert_lpips_weights.py) into a
    params dict (jnp arrays + 'arch' string)."""
    z = np.load(path)
    params = {k: jnp.asarray(z[k]) for k in z.files if k != "arch"}
    params["arch"] = str(z["arch"])
    return params


def random_params(arch: str, seed: int = 0) -> dict:
    """Random-weight params in the exact production structure (tests /
    smoke only — perceptual scores need the converted real weights)."""
    r = np.random.RandomState(seed)
    params = {"arch": arch}
    in_ch, ci, taps = 3, 0, 0
    for op in SPECS[arch]:
        if op[0] == "conv":
            _, out_ch, k, _, _ = op
            params[f"conv{ci}_w"] = jnp.asarray(
                r.randn(k, k, in_ch, out_ch).astype(np.float32)
                * np.sqrt(2.0 / (k * k * in_ch))
            )
            params[f"conv{ci}_b"] = jnp.asarray(
                r.randn(out_ch).astype(np.float32) * 0.01
            )
            in_ch = out_ch
            ci += 1
        elif op[0] == "tap":
            params[f"lin{taps}"] = jnp.asarray(
                r.rand(in_ch).astype(np.float32) * 0.1
            )
            taps += 1
    return params


_PAIR_RE = re.compile(r"^(frame\d+_view\d+)\.png$")


def score_comparison_dir(result_dir: str, weights_path: str,
                         batch: int = 8) -> dict:
    """Score every pred/gt PNG pair the image evaluator dumped under
    `<result_dir>/comparison` (frameXXXX_viewXXXX.png + _gt.png), write
    `lpips.npy` next to metrics.npy, and return the summary."""
    import cv2

    comp = os.path.join(result_dir, "comparison")
    if not os.path.isdir(comp):
        raise FileNotFoundError(
            f"{comp} not found — run `run.py --type evaluate` first to dump "
            "pred/gt comparison pairs"
        )
    params = load_lpips(weights_path)
    arch = params.pop("arch")  # string leaf can't ride through jit
    fn = jax.jit(lambda p, a, b: lpips_distance(p, a, b, arch))

    names, preds, gts = [], [], []
    for f in sorted(os.listdir(comp)):
        m = _PAIR_RE.match(f)
        if not m:
            continue
        gt_path = os.path.join(comp, m.group(1) + "_gt.png")
        if not os.path.exists(gt_path):
            continue
        pred = cv2.imread(os.path.join(comp, f))[..., ::-1]
        gt = cv2.imread(gt_path)[..., ::-1]
        names.append(m.group(1))
        preds.append(pred.astype(np.float32) / 255.0)
        gts.append(gt.astype(np.float32) / 255.0)
    if not names:
        raise FileNotFoundError(f"no frame*_view*.png pairs under {comp}")

    scores = []
    for i in range(0, len(names), batch):
        a = jnp.asarray(np.stack(preds[i : i + batch]))
        b = jnp.asarray(np.stack(gts[i : i + batch]))
        scores.extend(np.asarray(fn(params, a, b)).tolist())

    out = {"names": names, "lpips": scores, "mean": float(np.mean(scores))}
    np.save(os.path.join(result_dir, "lpips.npy"), out)
    print(f"the results are saved at {result_dir}")
    print(f"lpips ({arch}): {out['mean']}")
    return out
