"""Image transforms (lib/datasets/transforms.py).

The reference builds a ToTensor+Normalize Compose for every loader
(make_dataset.py:87) and then... never passes it into any dataset
(make_dataset.py:29-31 ignores the argument) — the pipeline normalizes
inline instead. Ported here as a WORKING utility with the same
semantics (uint8 -> [0,1] scale, ImageNet mean/std) so external
callers that relied on the reference surface find it; the shipped
datasets keep the reference's actual (inline) behavior.
"""

from __future__ import annotations

import numpy as np

IMAGENET_MEAN = (0.485, 0.456, 0.406)
IMAGENET_STD = (0.229, 0.224, 0.225)


class Compose:
    """transforms.py:1-19: apply in order; kpts ride along."""

    def __init__(self, transforms):
        self.transforms = list(transforms)

    def __call__(self, img, kpts=None):
        for t in self.transforms:
            img, kpts = t(img, kpts)
        return img if kpts is None else (img, kpts)

    def __repr__(self):
        inner = "\n".join(f"    {t!r}" for t in self.transforms)
        return f"{type(self).__name__}(\n{inner}\n)"


class ToTensor:
    """transforms.py:22-24: scale to [0, 1] (no HWC->CHW move — the
    reference's version only divides)."""

    def __call__(self, img, kpts=None):
        return np.asarray(img, np.float32) / 255.0, kpts

    def __repr__(self):
        return "ToTensor()"


class Normalize:
    """transforms.py:27-35 (non-mutating: the reference's -= / /= on
    the caller's array is a foot-gun this port does not keep)."""

    def __init__(self, mean, std):
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)

    def __call__(self, img, kpts=None):
        return (np.asarray(img, np.float32) - self.mean) / self.std, kpts

    def __repr__(self):
        return f"Normalize(mean={self.mean.tolist()}, std={self.std.tolist()})"


def make_transforms(cfg=None, is_train: bool = True):
    """transforms.py:38-53 — identical train/test composition."""
    del cfg, is_train  # the reference ignores both branches' difference
    return Compose([ToTensor(), Normalize(IMAGENET_MEAN, IMAGENET_STD)])
