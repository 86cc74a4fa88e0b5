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


def _segmented_sum_scan(values, is_start):
    """Inclusive SEGMENTED prefix sum along axis 0: resets at is_start.

    Hillis-Steele log-stepped formulation — every step is the same
    full-length shift+select+add, so the HLO stays small and the
    compiler vectorizes each pass. (jax.lax.associative_scan builds a
    work-efficient pyramid of VARYING-shape slices instead; its
    whole-frame program blew the remote-compile budget here.)
    values (N, C), is_start (N,) bool.
    """
    n = values.shape[0]
    v = values
    g = is_start
    d = 1
    while d < n:
        v_prev = jnp.concatenate(
            [jnp.zeros((d, v.shape[1]), v.dtype), v[:-d]], axis=0
        )
        g_prev = jnp.concatenate(
            [jnp.ones((d,), bool), g[:-d]], axis=0
        )
        v = v + jnp.where(g[:, None], 0.0, v_prev)
        g = g | g_prev
        d *= 2
    return v


def composite_compacted(sidx, slot_valid, rgb, alpha, z, n_rays: int,
                        n_samples: int, ray_counts=None):
    """Volume compositing directly on a survivor-compacted sample stream.

    The compaction (models/common.py compact_payload) is stable, so
    compacted slots are ordered by (ray, sample); per-ray transmittance
    is a SEGMENTED exclusive cumprod over the stream (associative scan
    with reset flags) and the maps come from a segmented sum gathered at
    per-ray end offsets — no scatter anywhere. The previous formulation
    scattered 4.2M source rows twice; XLA TPU scatter serializes per
    source row (~130 ms of a 540 ms eval frame). Segment-local sums also
    avoid the f32 cancellation of differencing a stream-global prefix.

    Numerics vs the dense path: identical except that skipped samples'
    (1 - 0 + 1e-10) transmittance factors are not multiplied in — a
    relative difference of ~(1 + 1e-10)^S, i.e. ~6e-9 at S=64.

    Args:
      sidx: (cap,) compacted original sample indices (sorted; dead slots
        = R*S). slot_valid: (cap,) bool. rgb (cap, 3), alpha (cap,),
        z (cap,) per-slot values.
      ray_counts: optional (R,) int — survivors per ray BEFORE capacity
        truncation (callers have it as pind.reshape(R, S).sum(-1));
        derived by binary search over the sorted ray ids when absent.
    Returns (rgb_map (R,3), acc_map (R,), depth_map (R,)).
    """
    cap = sidx.shape[0]
    ray_id = jnp.where(slot_valid, sidx // n_samples, n_rays)
    alpha = jnp.where(slot_valid, alpha, 0.0)

    one_m = jnp.where(slot_valid, 1.0 - alpha + 1e-10, 1.0)
    logs = jnp.log(jnp.maximum(one_m, 1e-10))
    prev = jnp.concatenate([jnp.full((1,), -1, ray_id.dtype), ray_id[:-1]])
    is_start = ray_id != prev
    # segment-local exclusive log-transmittance
    excl = _segmented_sum_scan(logs[:, None], is_start)[:, 0] - logs
    trans = jnp.exp(jnp.clip(excl, -80.0, 0.0))

    w = alpha * trans
    vals = jnp.concatenate(
        [w[:, None] * rgb, w[:, None], (w * z)[:, None]], axis=-1
    )
    seg = _segmented_sum_scan(vals, is_start)  # (cap, 5) running per-ray

    # per-ray end offsets (exclusive) into the compacted stream
    if ray_counts is None:
        offs = jnp.searchsorted(
            ray_id, jnp.arange(n_rays, dtype=ray_id.dtype), side="right"
        )
    else:
        offs = jnp.minimum(
            jnp.cumsum(ray_counts.astype(jnp.int32)), cap
        )
    starts = jnp.concatenate([jnp.zeros((1,), offs.dtype), offs[:-1]])
    has = offs > starts
    out = jnp.where(
        has[:, None],
        jnp.pad(seg, ((1, 0), (0, 0)))[offs],
        0.0,
    )
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
