"""SDF -> opacity conversions (VolSDF-style Laplace CDF and NeuS-style
sigmoid-CDF residuals).

Reference semantics:
  * VolSDF / anisdf_pdf: lib/networks/bw_deform/anisdf_pdf_network.py:271-286
    (`sdf_to_alpha`) and :330-331 (alpha = 1 - exp(-relu(sigma) * 0.005),
    with the hard-coded 0.005 step).
  * NeuS / anisdf_neus_pdf: lib/utils/sdf_utils.py:14-67. The reference
    scatters through `batch['pind']` because it compacts points; under
    masked compute the per-ray (R, S) layout is contiguous, so the
    conversion is a plain shifted difference — filtered points carry
    sdf = +10, whose cdf ~= 1 reproduces the reference's `full_cdf = 1`
    fill.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def volsdf_sigma(sdf, beta):
    """Laplace-CDF density: sigma(sdf) with scale beta (learned scalar).

    anisdf_pdf_network.py:271-286 — with x = -sdf:
      x <= 0: 0.5/beta * exp(x/beta)
      x >  0: 1/beta * (1 - 0.5 * exp(-x/beta))
    """
    x = -sdf
    val0 = 0.5 / beta * jnp.exp(jnp.minimum(x, 0.0) / beta)
    val1 = 1.0 / beta * (1.0 - 0.5 * jnp.exp(-jnp.maximum(x, 0.0) / beta))
    return jnp.where(x <= 0, val0, val1)


def sigma_to_alpha(sigma, step: float = 0.005):
    """alpha = 1 - exp(-relu(sigma) * step); the reference hard-codes
    step=0.005 regardless of the actual sample spacing
    (anisdf_pdf_network.py:330-331)."""
    return 1.0 - jnp.exp(-jnp.maximum(sigma, 0.0) * step)


def neus_alpha(sdf, inv_variance):
    """NeuS opacity from per-ray ordered SDF samples.

    Args:
      sdf: (R, S) sdf at the ray samples, in ray order (filtered samples
        should hold a large positive value, e.g. 10).
      inv_variance: scalar or broadcastable inverse variance s.

    Returns:
      alpha: (R, S) — clamp((cdf_i - cdf_{i+1} + 1e-5) / (cdf_i + 1e-5), 0, 1)
      with the last residual repeated (sdf_utils.py:40-61).
    """
    cdf = 1.0 / (1.0 + jnp.exp(-sdf * inv_variance))  # sigmoid
    residual = cdf[..., :-1] - cdf[..., 1:]
    p = jnp.concatenate([residual, residual[..., -1:]], axis=-1)
    alpha = (p + 1e-5) / (cdf + 1e-5)
    return jnp.clip(alpha, 0.0, 1.0)


def neus_anneal_ratio(iter_step, anneal_end: float = 25000.0):
    """Cosine-anneal ratio used by NeuS training (sdf_utils.py:7-11)."""
    return jnp.minimum(1.0, iter_step / anneal_end)


def sphere_tracing(wpts, sdf, ray_o, ray_d, sdf_fn,
                   n_iters: int = 20, threshold: float = 5e-5):
    """Bisection refinement of per-ray surface intersections.

    Reference: nerf_net_utils.py:91-141 — pick each ray's FIRST
    sign-change interval, bisect it (the reference loops while any ray
    is unfinished, max 20; here a fixed `n_iters` loop with masked
    updates — static shapes), and keep rays that converged from outside.
    Deviation: the refined depth is the ray-direction projection of the
    intersection point (the reference divides x-components, which is
    NaN/0 for rays perpendicular to the x axis).

    Args:
      wpts (R, S, 3), sdf (R, S), ray_o/ray_d (R, 3),
      sdf_fn: (M, 3) -> (M,) canonical/world sdf evaluator.
    Returns:
      (points (R, 3), z (R,), mask (R,)) — points/z are meaningful where
      mask is True (no boolean compaction).
    """
    from .composite import get_intersection_mask

    _, ind = get_intersection_mask(sdf)  # first crossing interval

    take = lambda a, i: jnp.take_along_axis(a, i[:, None], axis=1)[:, 0]
    cur_sdf = take(sdf, ind)
    start = jnp.take_along_axis(wpts, ind[:, None, None], axis=1)[:, 0]
    end = jnp.take_along_axis(wpts, (ind + 1)[:, None, None], axis=1)[:, 0]

    def body(_, carry):
        start, end, cur_sdf, unfinished = carry
        mid = (start + end) / 2.0
        mid_sdf = sdf_fn(mid)
        go_out = unfinished & (mid_sdf > 0)
        go_in = unfinished & (mid_sdf < 0)
        start = jnp.where(go_out[:, None], mid, start)
        end = jnp.where(go_in[:, None], mid, end)
        cur_sdf = jnp.where(unfinished, mid_sdf, cur_sdf)
        unfinished = unfinished & (
            (jnp.abs(mid_sdf) > threshold) | (mid_sdf < 0)
        )
        return start, end, cur_sdf, unfinished

    unfinished = jnp.abs(cur_sdf) > threshold
    start, end, cur_sdf, unfinished = jax.lax.fori_loop(
        0, n_iters, body, (start, end, cur_sdf, unfinished)
    )

    mask = (jnp.abs(cur_sdf) < threshold) & (cur_sdf >= 0)
    # depth by projection onto the (unit) ray direction — robust for any
    # ray orientation
    z = jnp.sum((start - ray_o) * ray_d, axis=-1)
    return start, z, mask
