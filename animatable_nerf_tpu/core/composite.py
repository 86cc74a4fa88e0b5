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


def composite_compacted(sidx, slot_valid, rgb, alpha, z, n_rays: int,
                        n_samples: int):
    """Volume compositing directly on a survivor-compacted sample stream.

    The compaction (models/common.py compact_payload) is stable, so
    compacted slots are ordered by (ray, sample); per-ray transmittance
    becomes a segmented exclusive cumprod over the stream and the maps
    become one segment-sum — this replaces the dense (R*S, 4) scatter-
    back + raw2outputs, whose scatter is the single most expensive op of
    the compacted eval render on TPU.

    Numerics vs the dense path: identical except that skipped samples'
    (1 - 0 + 1e-10) transmittance factors are not multiplied in — a
    relative difference of ~(1 + 1e-10)^S, i.e. ~6e-9 at S=64.

    Args:
      sidx: (cap,) compacted original sample indices (sorted; dead slots
        = R*S). slot_valid: (cap,) bool. rgb (cap, 3), alpha (cap,),
        z (cap,) per-slot values.
    Returns (rgb_map (R,3), acc_map (R,), depth_map (R,)).
    """
    ray_id = jnp.where(slot_valid, sidx // n_samples, n_rays)
    alpha = jnp.where(slot_valid, alpha, 0.0)

    one_m = jnp.where(slot_valid, 1.0 - alpha + 1e-10, 1.0)
    logs = jnp.log(jnp.maximum(one_m, 1e-10))
    excl = jnp.cumsum(logs) - logs
    # per-ray offset = excl at the segment's first slot
    prev = jnp.concatenate([jnp.full((1,), -1, ray_id.dtype), ray_id[:-1]])
    is_start = ray_id != prev
    base = jnp.zeros((n_rays + 1,)).at[
        jnp.where(is_start, ray_id, n_rays)
    ].set(excl, mode="drop")
    # clip: dead slots read an arbitrary base — alpha=0 kills their
    # weight but exp must not overflow to inf (0 * inf = nan)
    trans = jnp.exp(jnp.clip(excl - base[ray_id], -80.0, 1.0))

    w = alpha * trans
    vals = jnp.concatenate(
        [w[:, None] * rgb, w[:, None], (w * z)[:, None]], axis=-1
    )
    out = jnp.zeros((n_rays + 1, 5)).at[ray_id].add(
        vals, mode="drop", indices_are_sorted=True
    )[:n_rays]
    return out[:, :3], out[:, 3], out[:, 4]


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
