"""Shared masked-compute helpers for the model layer."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keep_mask_with_argmin(norm_vals, threshold):
    """mask = norm_vals < threshold, with the global argmin point forced on.

    Reproduces the reference's `pind[arange, pnorm.argmin()] = True`
    keep-at-least-one hack (tpose_nerf_network.py:153-154,
    anisdf_pdf_network.py:173-174) so numerics match even when no point
    passes the threshold.
    """
    mask = norm_vals < threshold
    forced = jax.nn.one_hot(jnp.argmin(norm_vals), norm_vals.shape[-1], dtype=bool)
    return mask | forced


def inside_bounds(pts, bounds, pad: float = 0.0):
    """All-axes AABB membership: (N, 3), (2, 3) -> (N,) bool.

    Strict inequalities as in the reference (tpose_nerf_network.py:186-188).
    """
    lo = bounds[0] - pad
    hi = bounds[1] + pad
    return jnp.all((pts > lo) & (pts < hi), axis=-1)


def broadcast_viewdirs(viewdir, n_samples):
    """(R, 3) ray dirs -> (R*S, 3) per-sample dirs."""
    return jnp.broadcast_to(
        viewdir[:, None, :], (viewdir.shape[0], n_samples, 3)
    ).reshape(-1, 3)


def raw_alpha_from_sigma(sigma, dists):
    """alpha = 1 - exp(-relu(sigma) * dists) (tpose_nerf_network.py:201)."""
    return 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)
