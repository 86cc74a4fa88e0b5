"""Backward-safe elementary functions.

`sqrt` and `linalg.norm` have an infinite derivative at exactly 0; in a
masked dense-compute graph (everything is evaluated, selection happens
afterwards) an exact zero WILL occur — e.g. `substitute_masked` plants
masked-out points exactly on a SMPL vertex, so the KNN distance to that
vertex is 0, and a zero-initialised residual field has ||resd|| = 0 at
every point. The inf cotangent then meets the masking `where`'s zero
and poisons the whole gradient with NaN (observed: one AlignedLBW train
step turned the entire bw_field subtree NaN; jit-vs-eager differed only
because fusion rounding decided whether d^2 was 0.0 or 1e-12).

The reference never hits this because it boolean-gathers survivors
before computing (sample_utils.py:309-348) — a luxury static-shape TPU
programs don't have. Zero is the correct subgradient at the kink, so
these helpers are exact in value everywhere and differ from the raw ops
only in carrying a finite (zero) gradient at 0.
"""

from __future__ import annotations

import jax.numpy as jnp


def safe_sqrt(x):
    """sqrt with a zero subgradient at x <= 0 (value identical: sqrt of
    a clamped-nonnegative input).

    NaN inputs stay NaN (`x * 0`), NOT 0: downstream filters rely on
    garbage distances being non-finite to mask the point out
    (keep_mask_with_argmin sanitizes non-finite to +inf). Mapping NaN
    to 0 would make an inf-coordinate point look like a perfect match
    and KEEP it — reintroducing the very poisoning this module guards
    against."""
    positive = x > 0
    root = jnp.sqrt(jnp.where(positive, x, 1.0))
    return jnp.where(positive, root, x * 0.0)


def safe_norm(x, axis=-1, keepdims: bool = False):
    """L2 norm with a zero subgradient at ||x|| = 0 (value identical)."""
    return safe_sqrt(jnp.sum(x * x, axis=axis, keepdims=keepdims))
