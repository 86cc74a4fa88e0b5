"""Linear blend skinning warps between world / posed-SMPL / canonical spaces.

Reference semantics: lib/utils/blend_utils.py:6-105. The backward warp
blends 24 bone transforms per point and inverts the blended 3x3 rotation
block. The reference calls `torch.inverse`; on TPU we use the analytic
adjugate inverse (a handful of fused VPU ops — no LU factorization and no
tiny-batched kernel launches).

All functions are shape-polymorphic over leading batch dims and jittable.
Conventions (matching the reference):
  * points are (..., N, 3); blend weights are (..., N, 24) here
    (the reference passes (B, 24, N) — we keep the channels-last layout
    that XLA prefers and transpose at the call sites of converted code).
  * A is (..., 24, 4, 4) per-frame bone transforms (canonical -> posed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# full-precision matmuls for all geometric transforms (see core/skeleton.py)
_HI = jax.lax.Precision.HIGHEST


def world_points_to_pose_points(wpts, Rh, Th):
    """(wpts - Th) @ Rh — world to SMPL coordinates. blend_utils.py:6-16."""
    return jnp.matmul(wpts - Th, Rh, precision=_HI)


def world_dirs_to_pose_dirs(wdirs, Rh):
    """wdirs @ Rh. blend_utils.py:19-28."""
    return jnp.matmul(wdirs, Rh, precision=_HI)


def pose_points_to_world_points(ppts, Rh, Th):
    """ppts @ Rh^T + Th. blend_utils.py:31-38."""
    return jnp.matmul(ppts, jnp.swapaxes(Rh, -1, -2), precision=_HI) + Th


def _blend_transforms(bw, A):
    """Per-point blended 4x4 transform: sum_k bw[..., k] * A[..., k, :, :].

    bw: (..., N, 24); A: (..., 24, 4, 4) -> (..., N, 4, 4).
    The contraction is a (N, 24) x (24, 16) matmul — MXU-shaped.
    """
    A_flat = A.reshape(*A.shape[:-3], 24, 16)
    M = jnp.matmul(bw, A_flat, precision=_HI)  # (..., N, 16)
    return M.reshape(*M.shape[:-1], 4, 4)


def inverse_3x3(m, det_eps: float = 0.0):
    """Analytic 3x3 inverse via the adjugate. m: (..., 3, 3).

    `det_eps` > 0 clamps |det| away from zero (sign-preserving). The
    blended LBS transform is a convex combination of bone rotations and
    CAN drift arbitrarily close to singular while the blend-weight field
    trains (e.g. 0.5*Rz(0) + 0.5*Rz(pi) has a rank-1 rotation part); the
    inverse's derivative scales ~1/det^2 and overflows f32 around
    |det| ~ 1e-17, after which the zero cotangent of the downstream
    masking `where` multiplies inf -> NaN and poisons the bw-field
    params in one backward pass (observed in a real AlignedLBW run).
    Clamping at 1e-6 bounds the derivative ~1e12 — far below overflow —
    and is exact for every healthy blend (|det| ~ 1 for near-rotation
    blends). The reference's torch.inverse hard-fails the same way; it
    merely never trained a scene degenerate enough to hit it."""
    a, b, c = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    d, e, f = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    g, h, i = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]
    A = e * i - f * h
    B = -(d * i - f * g)
    C = d * h - e * g
    det = a * A + b * B + c * C
    if det_eps:
        nonneg = jnp.where(det >= 0, 1.0, -1.0)  # sign(0) -> +1
        det = nonneg * jnp.maximum(jnp.abs(det), det_eps)
    inv_det = 1.0 / det
    adj = jnp.stack(
        [
            A, -(b * i - c * h), (b * f - c * e),
            B, (a * i - c * g), -(a * f - c * d),
            C, -(a * h - b * g), (a * e - b * d),
        ],
        axis=-1,
    ).reshape(*m.shape[:-2], 3, 3)
    return adj * inv_det[..., None, None]


def _matvec3(R, v):
    """Per-point 3x3 matrix-vector product as a broadcast
    multiply-reduce. An einsum here lowers to millions of batched 3x3
    dot_generals that pad onto 128x128 MXU tiles (~100x wasted work);
    this form stays on the VPU."""
    return jnp.sum(R * v[..., None, :], axis=-1)


def pose_points_to_tpose_points(ppts, bw, A):
    """Backward LBS warp: posed SMPL space -> canonical space.

    Reference: blend_utils.py:41-59 (there bw is (B, 24, N); here (..., N, 24)).
    """
    M = _blend_transforms(bw, A)  # (..., N, 4, 4)
    pts = ppts - M[..., :3, 3]
    R_inv = inverse_3x3(M[..., :3, :3], det_eps=1e-6)
    return _matvec3(R_inv, pts)


def pose_dirs_to_tpose_dirs(ddirs, bw, A):
    """Backward LBS warp of directions. blend_utils.py:62-75."""
    M = _blend_transforms(bw, A)
    R_inv = inverse_3x3(M[..., :3, :3], det_eps=1e-6)
    return _matvec3(R_inv, ddirs)


def tpose_points_to_pose_points(pts, bw, A):
    """Forward LBS warp: canonical -> posed. blend_utils.py:77-90."""
    M = _blend_transforms(bw, A)
    return _matvec3(M[..., :3, :3], pts) + M[..., :3, 3]


def tpose_dirs_to_pose_dirs(ddirs, bw, A):
    """Forward LBS warp of directions. blend_utils.py:93-105."""
    M = _blend_transforms(bw, A)
    return _matvec3(M[..., :3, :3], ddirs)


def backward_warp_points_dirs(ppts, pdirs, bw, A, big_A):
    """Fused posed -> T-pose -> big-pose warp for points AND dirs.

    Semantically identical to the reference's call sequence
    pose_points_to_tpose_points + tpose_points_to_pose_points (+ the two
    dir variants, anisdf_pdf_network.py:92-103), but the blended
    transforms M(bw, A) and M(bw, big_A) and the 3x3 inverse are
    computed ONCE and shared — the reference re-blends per call (4
    (N,24)x(24,16) matmuls + 2 analytic inverses for the same weights).
    Same floating-point operations on each path, so results are
    bit-identical to the unfused sequence.

    Returns (init_bigpose, bigpose_dirs | None).
    """
    M1 = _blend_transforms(bw, A)
    R1_inv = inverse_3x3(M1[..., :3, :3], det_eps=1e-6)
    M2 = _blend_transforms(bw, big_A)
    R2 = M2[..., :3, :3]
    tpose = _matvec3(R1_inv, ppts - M1[..., :3, 3])
    init_bigpose = _matvec3(R2, tpose) + M2[..., :3, 3]
    dirs = None
    if pdirs is not None:
        dirs = _matvec3(R2, _matvec3(R1_inv, pdirs))
    return init_bigpose, dirs
