"""Closest point on a triangle mesh, vectorized in JAX.

Replaces two native dependencies of the reference:
  * psbody/CGAL `closest_faces_and_points` +
    `barycentric_coordinates_for_points` in the blend-weight prep tools
    (tools/custom_dataset/prepare_blend_weights.py:195-203, 268-274);
  * the pytorch3d `point_face_dist_forward/backward` CUDA kernels behind
    lib/utils/sample_utils.py:28-70 (PointMeshDistance).

Implementation: the standard Ericson closest-point-on-triangle region
test, broadcast over (point-chunk, faces) and lax.map'ed over chunks —
everything static-shape, runs on CPU or TPU.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp


def _closest_on_tri(p, a, b, c):
    """Closest point on triangle abc to p; all (..., 3).
    Returns (point (..., 3), barycentric (..., 3))."""
    ab = b - a
    ac = c - a
    ap = p - a
    d1 = jnp.sum(ab * ap, -1)
    d2 = jnp.sum(ac * ap, -1)

    bp = p - b
    d3 = jnp.sum(ab * bp, -1)
    d4 = jnp.sum(ac * bp, -1)

    cp = p - c
    d5 = jnp.sum(ab * cp, -1)
    d6 = jnp.sum(ac * cp, -1)

    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2

    # region masks (evaluated densely, selected with where)
    denom_sum = va + vb + vc
    v_face = vb / jnp.where(denom_sum == 0, 1.0, denom_sum)
    w_face = vc / jnp.where(denom_sum == 0, 1.0, denom_sum)

    # edge AB
    t_ab = d1 / jnp.where(d1 - d3 == 0, 1.0, d1 - d3)
    t_ab = jnp.clip(t_ab, 0.0, 1.0)
    # edge AC
    t_ac = d2 / jnp.where(d2 - d6 == 0, 1.0, d2 - d6)
    t_ac = jnp.clip(t_ac, 0.0, 1.0)
    # edge BC
    t_bc = (d4 - d3) / jnp.where(
        (d4 - d3) + (d5 - d6) == 0, 1.0, (d4 - d3) + (d5 - d6)
    )
    t_bc = jnp.clip(t_bc, 0.0, 1.0)

    in_a = (d1 <= 0) & (d2 <= 0)
    in_b = (d3 >= 0) & (d4 <= d3)
    in_c = (d6 >= 0) & (d5 <= d6)
    on_ab = (~in_a) & (~in_b) & (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    on_ac = (~in_a) & (~in_c) & (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    on_bc = (
        (~in_b) & (~in_c) & (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    )

    # barycentric coords (u, v, w) for point = u*a + v*b + w*c
    u = jnp.ones_like(d1)
    v = jnp.zeros_like(d1)
    w = jnp.zeros_like(d1)
    # face interior (default unless a vertex/edge case hits)
    face = ~(in_a | in_b | in_c | on_ab | on_ac | on_bc)
    u = jnp.where(face, 1.0 - v_face - w_face, u)
    v = jnp.where(face, v_face, v)
    w = jnp.where(face, w_face, w)
    v = jnp.where(on_ab, t_ab, v)
    u = jnp.where(on_ab, 1.0 - t_ab, u)
    w = jnp.where(on_ab, 0.0, w)
    w = jnp.where(on_ac, t_ac, w)
    u = jnp.where(on_ac, 1.0 - t_ac, u)
    v = jnp.where(on_ac, 0.0, v)
    v = jnp.where(on_bc, 1.0 - t_bc, v)
    w = jnp.where(on_bc, t_bc, w)
    u = jnp.where(on_bc, 0.0, u)
    u = jnp.where(in_b, 0.0, u)
    v = jnp.where(in_b, 1.0, v)
    w = jnp.where(in_b, 0.0, w)
    u = jnp.where(in_c, 0.0, u)
    v = jnp.where(in_c, 0.0, v)
    w = jnp.where(in_c, 1.0, w)

    point = u[..., None] * a + v[..., None] * b + w[..., None] * c
    bary = jnp.stack([u, v, w], axis=-1)
    return point, bary


@functools.partial(jax.jit, static_argnames=("chunk",))
def _closest_point_jit(pts, tri_a, tri_b, tri_c, chunk: int = 512):
    n = pts.shape[0]
    n_pad = -(-n // chunk) * chunk
    pts_p = jnp.pad(pts, ((0, n_pad - n), (0, 0)))

    def one_chunk(p):
        # p (chunk, 3) vs all faces (F, 3)
        cp, bary = _closest_on_tri(
            p[:, None, :], tri_a[None], tri_b[None], tri_c[None]
        )  # (chunk, F, 3)
        d2 = jnp.sum((p[:, None, :] - cp) ** 2, -1)  # (chunk, F)
        fidx = jnp.argmin(d2, axis=1)
        take = lambda arr: jnp.take_along_axis(
            arr, fidx[:, None, None], axis=1
        )[:, 0]
        return (
            jnp.sqrt(jnp.take_along_axis(d2, fidx[:, None], 1)[:, 0]),
            fidx,
            take(cp),
            take(bary),
        )

    dists, fidx, cpts, bary = jax.lax.map(
        one_chunk, pts_p.reshape(-1, chunk, 3)
    )
    return (
        dists.reshape(-1)[:n],
        fidx.reshape(-1)[:n],
        cpts.reshape(-1, 3)[:n],
        bary.reshape(-1, 3)[:n],
    )


def closest_point_on_mesh(pts, verts, faces, chunk: int = 512):
    """For each query point: distance, face index, closest point,
    barycentric coords on that face.

    pts (N, 3); verts (V, 3); faces (F, 3) int.
    Returns dict {dist (N,), face (N,), point (N,3), bary (N,3)}.
    """
    verts = jnp.asarray(verts, jnp.float32)
    faces = np.asarray(faces)
    tri = verts[faces]  # (F, 3, 3)
    d, f, p, b = _closest_point_jit(
        jnp.asarray(pts, jnp.float32), tri[:, 0], tri[:, 1], tri[:, 2],
        chunk=chunk,
    )
    return {"dist": d, "face": f, "point": p, "bary": b}
