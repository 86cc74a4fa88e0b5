"""Point-cloud ops: TPU-native replacement for the reference's only
in-tree CUDA extension (lib/csrc/pointnet2, SURVEY.md §2.8).

Semantics mirror the CUDA kernels (consumed by the NHR baseline through
lib/networks/pointnet2/pointnet2_msg.py):

  furthest_point_sample — src/sampling_gpu.cu: greedy max-min-distance
    sampling seeded at index 0.
  ball_query            — src/ball_query_gpu.cu: per center, the first
    `nsample` point indices (in input order) with d2 < radius^2; short
    balls are padded by repeating the FIRST in-ball index; empty balls
    return index 0.
  group_points          — src/group_points_gpu.cu: feature gather.
  three_nn / three_interpolate — src/interpolate_gpu.cu: 3-NN inverse-
    distance-weighted feature propagation.

Design notes: everything is static-shape, batched, and vmapped; pairwise
distances are computed in the matmul form so the contraction lands on
the MXU; ball-query's "first nsample in input order" is expressed as a
top_k over (-index | in-ball) instead of a sequential scan. Gradients
flow through the feature gathers (gather/scatter-add under autodiff),
matching the CUDA backward kernels.

Layout: channels-last (B, N, C) — the TPU-friendly layout — where the
CUDA ops used (B, C, N).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_HI = jax.lax.Precision.HIGHEST


def _pairwise_d2(a, b):
    """(N,3),(M,3) -> (N,M) squared distances (matmul form, MXU)."""
    a2 = jnp.sum(a * a, axis=-1, keepdims=True)
    b2 = jnp.sum(b * b, axis=-1)
    d2 = a2 - 2.0 * jnp.matmul(a, b.T, precision=_HI) + b2[None, :]
    return jnp.maximum(d2, 0.0)


def _fps_single(xyz, npoint: int):
    """(N,3) -> (npoint,) int32. Greedy max-min sampling, seed = 0."""
    N = xyz.shape[0]

    def step(carry, _):
        mind2, last = carry
        d2 = jnp.sum((xyz - xyz[last]) ** 2, axis=-1)
        mind2 = jnp.minimum(mind2, d2)
        nxt = jnp.argmax(mind2).astype(jnp.int32)
        return (mind2, nxt), nxt

    init = (jnp.full((N,), jnp.inf, jnp.float32), jnp.int32(0))
    if npoint == 1:
        return jnp.zeros((1,), jnp.int32)
    (_, _), rest = jax.lax.scan(step, init, None, length=npoint - 1)
    return jnp.concatenate([jnp.zeros((1,), jnp.int32), rest])


@functools.partial(jax.jit, static_argnames=("npoint",))
def furthest_point_sample(xyz, npoint: int):
    """xyz: (B, N, 3) -> (B, npoint) int32 indices."""
    return jax.vmap(lambda x: _fps_single(x, npoint))(xyz)


def gather_points(points, idx):
    """points (B, N, C), idx (B, S) -> (B, S, C)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def _ball_query_single(new_xyz, xyz, radius: float, nsample: int):
    S, N = new_xyz.shape[0], xyz.shape[0]
    d2 = _pairwise_d2(new_xyz, xyz)                    # (S, N)
    inball = d2 < radius * radius
    col = jax.lax.broadcasted_iota(jnp.int32, (S, N), 1)
    # first-nsample-in-order == top_k of (in-ball first, then low index)
    score = jnp.where(inball, -col, -(col + N))
    _, idx = jax.lax.top_k(score, nsample)             # (S, nsample)
    idx = idx.astype(jnp.int32)
    picked_inball = jnp.take_along_axis(inball, idx, axis=1)
    first = idx[:, :1]                                  # first in ball (or not)
    any_inball = picked_inball[:, :1]
    fill = jnp.where(any_inball, first, 0)
    return jnp.where(picked_inball, idx, fill)


@functools.partial(jax.jit, static_argnames=("radius", "nsample"))
def ball_query(radius: float, nsample: int, xyz, new_xyz):
    """xyz (B, N, 3), new_xyz (B, S, 3) -> (B, S, nsample) int32."""
    return jax.vmap(
        lambda nx, x: _ball_query_single(nx, x, radius, nsample)
    )(new_xyz, xyz)


def group_points(points, idx):
    """points (B, N, C), idx (B, S, nsample) -> (B, S, nsample, C)."""
    return jax.vmap(lambda p, i: p[i])(points, idx)


def _three_nn_single(unknown, known):
    d2 = _pairwise_d2(unknown, known)
    neg, idx = jax.lax.top_k(-d2, 3)
    return jnp.sqrt(jnp.maximum(-neg, 0.0)), idx.astype(jnp.int32)


@jax.jit
def three_nn(unknown, known):
    """unknown (B, n, 3), known (B, m, 3) -> (dist (B,n,3), idx (B,n,3))."""
    return jax.vmap(_three_nn_single)(unknown, known)


@jax.jit
def three_interpolate(points, idx, weight):
    """points (B, m, C), idx (B, n, 3), weight (B, n, 3) -> (B, n, C)."""
    gathered = jax.vmap(lambda p, i: p[i])(points, idx)  # (B, n, 3, C)
    return jnp.einsum("bnkc,bnk->bnc", gathered, weight)


def interpolation_weights(dist, eps: float = 1e-8):
    """IDW weights from three_nn distances (interpolate_gpu.cu fwd)."""
    recip = 1.0 / (dist + eps)
    return recip / jnp.sum(recip, axis=-1, keepdims=True)
