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
