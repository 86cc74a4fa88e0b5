"""Checkpoint compatibility: import PyTorch reference checkpoints
(.pth trained by xx-peach/animatable_nerf) into this framework's flax
param trees, tensor-for-tensor (SURVEY.md §5 checkpoint/resume:
"a .pth-compatible import shim").
"""

from .torch_import import (
    load_torch_state_dict,
    conv1d_to_dense,
    linear_to_dense,
    weight_norm_to_wn,
    convert_aninerf,
    convert_sdf_pdf,
    convert_nerf_pdf,
    convert_aligned_lbw,
    convert_aligned_pbw,
    convert_aligned_smpl,
    convert_aligned_lbw_pdf,
    convert_neus_pdf,
)
