"""Pure math kernels (jnp + Pallas): no I/O, no config objects.

Each function documents the reference semantics it reproduces
(file:line citations into /root/reference)."""

from .encoding import positional_encoding, encoding_dim
from .skeleton import batch_rodrigues, rigid_transforms, big_pose_A
from .lbs import (
    world_points_to_pose_points,
    world_dirs_to_pose_dirs,
    pose_points_to_world_points,
    pose_points_to_tpose_points,
    pose_dirs_to_tpose_dirs,
    tpose_points_to_pose_points,
    tpose_dirs_to_pose_dirs,
    backward_warp_points_dirs,
)
from .grid import grid_trilerp, pts_sample_blend_weights
from .rays import get_rays_np, get_near_far_np, get_near_far_masked, get_bound_2d_mask
from .sampling import stratified_z_vals, z_vals_to_dists
from .composite import raw2outputs, sample_pdf, get_intersection_mask
from .knn import sample_blend_closest_points
from .sdf import volsdf_sigma, sigma_to_alpha
