"""animatable_nerf_tpu — a TPU-native (JAX/XLA/Pallas) framework for animatable
human neural radiance fields.

Re-designed from scratch for TPU hardware with the capability surface of the
Animatable NeRF reference (ICCV'21 + TPAMI extension): per-subject canonical
neural fields (NeRF density or SDF) plus deformation modules (neural
blend-weight fields or pose-dependent displacement fields) that backward-warp
posed-space samples into canonical space via SMPL linear blend skinning.

Design principles (TPU-first, not a port):
  * every hot path is a single jitted program — no Python chunk loops
  * static shapes + masked compute instead of boolean gather/compact
  * MXU-shaped kernels (batched matmuls) for MLPs and KNN
  * multi-chip scaling via jax.sharding.Mesh + ICI collectives
"""

__version__ = "0.1.0"
