"""SMPL skeleton math: Rodrigues rotations and kinematic-chain rigid
transforms.

Reference semantics: lib/utils/if_nerf/if_nerf_data_utils.py:392-458
(`batch_rodrigues`, `get_rigid_transformation`). These run both on the
host data path (numpy inputs are fine under jnp) and inside jitted
programs; the 24-joint chain is unrolled at trace time (static tree).
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

N_JOINTS = 24

# Geometric matmuls must run in full float32: JAX's default matmul
# precision on TPU accumulates through bf16 passes, which costs ~1e-3
# of absolute accuracy on rotation composes — enough to corrupt LBS warps.
_HI = jax.lax.Precision.HIGHEST


def batch_rodrigues(poses: jnp.ndarray) -> jnp.ndarray:
    """Axis-angle (N, 3) -> rotation matrices (N, 3, 3).

    Matches the reference's numerics exactly, including the `poses + 1e-8`
    inside the norm (if_nerf_data_utils.py:396).
    """
    poses = jnp.asarray(poses)
    angle = jnp.linalg.norm(poses + 1e-8, axis=-1, keepdims=True)  # (N, 1)
    rot_dir = poses / angle
    cos = jnp.cos(angle)[..., None]  # (N, 1, 1)
    sin = jnp.sin(angle)[..., None]
    rx, ry, rz = rot_dir[..., 0], rot_dir[..., 1], rot_dir[..., 2]
    zeros = jnp.zeros_like(rx)
    K = jnp.stack(
        [zeros, -rz, ry, rz, zeros, -rx, -ry, rx, zeros], axis=-1
    ).reshape(*poses.shape[:-1], 3, 3)
    ident = jnp.eye(3, dtype=poses.dtype)
    KK = jnp.matmul(K, K, precision=_HI)
    return ident + sin * K + (1.0 - cos) * KK


def rigid_transforms(
    poses: jnp.ndarray,
    joints: jnp.ndarray,
    parents: np.ndarray,
    return_joints: bool = False,
):
    """Per-bone transforms G = A(pose, J_rel) @ A(rest, J)^{-1}.

    Args:
      poses: (24, 3) axis-angle per joint (root pose excluded — the global
        orientation lives in Rh/Th, as in ZJU-MoCap).
      joints: (24, 3) rest-pose joint locations in SMPL coordinates.
      parents: (24,) static kinematic tree (host numpy — unrolled at trace).

    Returns:
      (24, 4, 4) transforms mapping canonical (rest) points to posed SMPL
      space; optionally also the posed joint locations (24, 3).

    Reference: if_nerf_data_utils.py:414-458.
    """
    poses = jnp.asarray(poses)
    joints = jnp.asarray(joints)
    parents = np.asarray(parents)

    rot_mats = batch_rodrigues(poses)  # (24, 3, 3)
    rel_joints = joints.at[1:].add(-joints[parents[1:]])  # (24, 3)

    # 4x4 per-joint local transforms (joint count from the tree: 24 for
    # SMPL, 52/55 for SMPL-H/X host-side models)
    n_joints = parents.shape[0]
    tm = jnp.concatenate([rot_mats, rel_joints[..., None]], axis=-1)  # (24,3,4)
    bottom = jnp.tile(
        jnp.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=poses.dtype), (n_joints, 1, 1)
    )
    tm = jnp.concatenate([tm, bottom], axis=-2)  # (24, 4, 4)

    # compose along the static kinematic tree (unrolled: 24 joints)
    chain = [tm[0]]
    for i in range(1, n_joints):
        chain.append(jnp.matmul(chain[parents[i]], tm[i], precision=_HI))
    transforms = jnp.stack(chain, axis=0)  # (24, 4, 4)

    posed_joints = transforms[:, :3, 3]

    # subtract the rest-pose joint transform: T[:, :, 3] -= T @ [J; 0]
    joints_h = jnp.concatenate(
        [joints, jnp.zeros_like(joints[:, :1])], axis=-1
    )  # (24, 4)
    rest = jnp.einsum("nij,nj->ni", transforms, joints_h, precision=_HI)  # (24, 4)
    transforms = transforms.at[..., 3].add(-rest)

    if return_joints:
        return transforms, posed_joints
    return transforms


def big_pose_A(joints: jnp.ndarray, parents: np.ndarray, angle_deg: float = 30.0):
    """Rigid transforms of the canonical "big pose" (legs spread).

    Reference: lib/datasets/tpose_dataset.py:80-90 — axis-angle components
    5 and 8 of the flattened 72-vector set to +/- 30 degrees.
    """
    big = np.zeros([N_JOINTS * 3], dtype=np.float32)
    big[5] = np.deg2rad(angle_deg)
    big[8] = np.deg2rad(-angle_deg)
    return rigid_transforms(big.reshape(-1, 3), joints, parents)


def big_poses_vec(angle_deg: float = 30.0) -> np.ndarray:
    """The (72,) axis-angle vector of the big pose (for pose-conditioned nets)."""
    big = np.zeros([N_JOINTS * 3], dtype=np.float32)
    big[5] = np.deg2rad(angle_deg)
    big[8] = np.deg2rad(-angle_deg)
    return big


@functools.lru_cache(maxsize=8)
def _rigid_transforms_jit(parents_key: tuple, return_joints: bool):
    parents = np.asarray(parents_key)
    return jax.jit(
        lambda poses, joints: rigid_transforms(
            poses, joints, parents, return_joints=return_joints
        )
    )


def rigid_transforms_host(poses, joints, parents, return_joints=False):
    """Host-data-path rigid transforms: jitted + cached per kinematic
    tree, pinned to the CPU backend. The eager unrolled 24-joint chain
    dispatches ~100 ops per call (~100 ms/item in the dataloader, and
    far worse if each eager op round-trips a remote accelerator); this
    is one cached CPU XLA program."""
    f = _rigid_transforms_jit(
        tuple(int(p) for p in np.asarray(parents)), bool(return_joints)
    )
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        out = f(
            np.asarray(poses, np.float32), np.asarray(joints, np.float32)
        )
    if return_joints:
        return np.asarray(out[0]), np.asarray(out[1])
    return np.asarray(out)
