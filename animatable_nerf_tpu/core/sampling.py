"""Stratified sampling of z-values along rays.

Reference semantics: lib/networks/renderer/tpose_renderer.py:14-39
(`get_wsampling_points`) and :63-66 (dists computation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def stratified_z_vals(near, far, n_samples: int, key=None, perturb: bool = False):
    """Linear z-values between near and far, with optional train-time jitter.

    Args:
      near, far: (...,) per-ray distances.
      n_samples: number of samples per ray (static).
      key: PRNG key; required when perturb is True.
      perturb: stratified jitter within each interval (cfg.perturb > 0 and
        training — tpose_renderer.py:29-36).

    Returns:
      z_vals: (..., n_samples).
    """
    t = jnp.linspace(0.0, 1.0, n_samples, dtype=jnp.float32)
    z = near[..., None] * (1.0 - t) + far[..., None] * t
    if perturb:
        mids = 0.5 * (z[..., 1:] + z[..., :-1])
        upper = jnp.concatenate([mids, z[..., -1:]], axis=-1)
        lower = jnp.concatenate([z[..., :1], mids], axis=-1)
        u = jax.random.uniform(key, z.shape, dtype=z.dtype)
        z = lower + (upper - lower) * u
    return z


def z_vals_to_pts(ray_o, ray_d, z_vals):
    """(..., 3), (..., 3), (..., S) -> (..., S, 3) world points."""
    return ray_o[..., None, :] + ray_d[..., None, :] * z_vals[..., None]


def z_vals_to_dists(z_vals):
    """Per-sample step sizes; the last interval is repeated
    (tpose_renderer.py:63-66)."""
    d = z_vals[..., 1:] - z_vals[..., :-1]
    return jnp.concatenate([d, d[..., -1:]], axis=-1)
