"""K-nearest-neighbor blend-weight sampling over SMPL vertices.

Replaces the reference's pytorch3d CUDA `knn_points` path
(lib/utils/sample_utils.py:309-348, `sample_blend_closest_points`):
K=5 KNN over the 6890 SMPL vertices, inverse-distance weights, weighted
blend-weight gather and weighted distance.

TPU-native design: the pairwise squared distance is an (N, 6890) matmul
(MXU-shaped); top-k runs on the compacted distance matrix. A fused Pallas
variant lives in animatable_nerf_tpu/ops/knn_pallas.py; this module is the
pure-XLA reference implementation and the fallback.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .numerics import safe_sqrt


def knn_dists_idx(src, ref, k: int = 5):
    """Squared-distance KNN. src: (N, 3), ref: (M, 3) -> (dists (N,k), idx (N,k)).

    Distances are true (non-negative) squared euclidean distances; the
    matmul form max(|s|^2 - 2 s.r + |r|^2, 0) keeps the contraction on
    the MXU.
    """
    s2 = jnp.sum(src * src, axis=-1, keepdims=True)  # (N, 1)
    r2 = jnp.sum(ref * ref, axis=-1)  # (M,)
    d2 = s2 - 2.0 * jnp.matmul(src, ref.T, precision=jax.lax.Precision.HIGHEST) + r2[None, :]  # (N, M)
    d2 = jnp.maximum(d2, 0.0)
    neg, idx = jax.lax.top_k(-d2, k)
    return -neg, idx


def sample_blend_closest_points(src, ref, values, k: int = 5, exp: float = 1e-8,
                                chunk: int = 65536):
    """Inverse-distance-weighted blend weights from the K nearest vertices.

    Args:
      src: (..., N, 3) query points (SMPL coordinates).
      ref: (..., M, 3) SMPL vertices.
      values: (..., M, C) per-vertex blend weights (C = 24).

    Returns:
      (sampled (..., N, C), dists (..., N, 1)) — matching
      sample_utils.py:323-348: dists are euclidean (sqrt of the KNN
      squared dists), weights = (1/(d+exp)) normalized over K, the
      returned distance is the weight-averaged distance.
    """
    batch_shape = src.shape[:-2]
    if batch_shape:
        flat = jax.vmap(lambda s, r, v: sample_blend_closest_points(s, r, v, k, exp))
        return flat(
            src.reshape(-1, *src.shape[-2:]),
            ref.reshape(-1, *ref.shape[-2:]),
            values.reshape(-1, *values.shape[-2:]),
        )

    n = src.shape[0]
    if n > chunk:
        # tile the query axis: the (N, M) distance matrix otherwise
        # materializes tens of GB at eval point counts
        import numpy as np

        n_pad = int(np.ceil(n / chunk) * chunk)
        src_p = jnp.pad(src, ((0, n_pad - n), (0, 0)))
        s_t, d_t = jax.lax.map(
            lambda s: sample_blend_closest_points(s, ref, values, k, exp),
            src_p.reshape(-1, chunk, 3),
        )
        return (
            s_t.reshape(n_pad, -1)[:n],
            d_t.reshape(n_pad, -1)[:n],
        )

    d2, idx = knn_dists_idx(src, ref, k)
    # safe_sqrt, NOT jnp.sqrt: a query coincident with a vertex (e.g.
    # substitute_masked's sanitized points) has d2 == 0 and sqrt's inf
    # derivative there NaN-poisons the whole backward (core/numerics.py)
    dists = safe_sqrt(d2)  # (N, k)
    disp = 1.0 / (dists + exp)
    weights = disp / jnp.sum(disp, axis=-1, keepdims=True)
    wdist = jnp.sum(dists * weights, axis=-1, keepdims=True)  # (N, 1)
    gathered = jnp.take(values, idx, axis=0)  # (N, k, C)
    # broadcast-reduce, not einsum: per-point (5, C) matvecs would pad
    # onto 128x128 MXU tiles
    sampled = jnp.sum(gathered * weights[..., None], axis=-2)
    return sampled, wdist
