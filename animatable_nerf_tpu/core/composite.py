"""Volume-rendering compositing and hierarchical sampling.

Reference semantics: lib/networks/renderer/nerf_net_utils.py:6-36
(`raw2outputs`), :40-75 (`sample_pdf`), :78-88 (`get_intersection_mask`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def raw2outputs(raw, z_vals, white_bkgd: bool = False):
    """Classic NeRF alpha compositing.

    Args:
      raw: (..., S, 4) rgb (already activated) + alpha (already converted
        from density by the network — the reference networks emit
        1 - exp(-relu(sigma) * dists) directly).
      z_vals: (..., S).

    Returns:
      rgb_map (..., 3), disp_map (...), acc_map (...), weights (..., S),
      depth_map (...).
    """
    rgb = raw[..., :-1]
    alpha = raw[..., -1]
    ones = jnp.ones_like(alpha[..., :1])
    trans = jnp.cumprod(
        jnp.concatenate([ones, 1.0 - alpha + 1e-10], axis=-1), axis=-1
    )[..., :-1]
    weights = alpha * trans
    rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    acc_map = jnp.sum(weights, axis=-1)
    disp_map = 1.0 / jnp.maximum(
        1e-10 * jnp.ones_like(depth_map), depth_map / acc_map
    )
    if white_bkgd:
        rgb_map = rgb_map + (1.0 - acc_map[..., None])
    return rgb_map, disp_map, acc_map, weights, depth_map


def sample_pdf(bins, weights, n_samples: int, key=None, det: bool = False):
    """Inverse-CDF hierarchical sampling (nerf_net_utils.py:40-75).

    bins: (R, B); weights: (R, B) -> samples (R, n_samples).
    """
    weights = weights + 1e-5
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[..., :1]), cdf], axis=-1)

    if det:
        u = jnp.linspace(0.0, 1.0, n_samples, dtype=cdf.dtype)
        u = jnp.broadcast_to(u, (*cdf.shape[:-1], n_samples))
    else:
        u = jax.random.uniform(key, (*cdf.shape[:-1], n_samples), dtype=cdf.dtype)

    inds = jax.vmap(lambda c, q: jnp.searchsorted(c, q, side="right"))(cdf, u)
    below = jnp.maximum(0, inds - 1)
    above = jnp.minimum(cdf.shape[-1] - 1, inds)

    cdf_g0 = jnp.take_along_axis(cdf, below, axis=-1)
    cdf_g1 = jnp.take_along_axis(cdf, above, axis=-1)
    bins_g0 = jnp.take_along_axis(bins, jnp.minimum(below, bins.shape[-1] - 1), axis=-1)
    bins_g1 = jnp.take_along_axis(bins, jnp.minimum(above, bins.shape[-1] - 1), axis=-1)

    denom = cdf_g1 - cdf_g0
    denom = jnp.where(denom < 1e-5, jnp.ones_like(denom), denom)
    t = (u - cdf_g0) / denom
    return bins_g0 + t * (bins_g1 - bins_g0)


def get_intersection_mask(sdf, z_vals=None):
    """Per-ray surface-crossing mask and the index of the last crossing.

    sdf: (..., S). Returns (mask (...,) bool, ind (...,) int32) — the
    reference picks, among sign changes, the one closest to the far end
    flipped weighting (nerf_net_utils.py:78-88).
    """
    sign = jnp.sign(sdf[..., :-1] * sdf[..., 1:])
    S = sign.shape[-1]
    ramp = jnp.arange(S - 1, -1, -1, dtype=sdf.dtype)
    ind = jnp.argmin(sign * ramp, axis=-1)
    mask = jnp.min(sign, axis=-1) == -1
    return mask, ind
