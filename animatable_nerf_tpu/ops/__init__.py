"""TPU kernel layer (Pallas) + native point-cloud ops.

This package holds the hand-written TPU kernels for the hot ops identified
in SURVEY.md §3.5 and the TPU-native replacements for the reference's
CUDA extensions (SURVEY.md §2.8):

  knn_pallas    — fused K=5 KNN blend-weight sampling (replaces the
                  pytorch3d `knn_points` path, lib/utils/sample_utils.py:309-348)
  mlp_pallas    — fused skip-MLP evaluation: the whole 8x256 trunk runs as
                  one kernel with weights resident in VMEM (replaces the
                  reference's unfused Conv1d stacks, tpose_nerf_network.py:25-29)
  pointnet2     — furthest-point sampling / ball query / grouping /
                  three-nn interpolation (replaces lib/csrc/pointnet2 CUDA)
  rasterize     — differentiable point-cloud splatting (replaces the
                  external PCPR CUDA rasterizer used by the NHR baseline)

Every Pallas kernel has a pure-XLA twin used (a) as the CPU fallback and
(b) as the numerics oracle in tests (interpret-mode comparison).
"""

from .knn_pallas import knn_blend_pallas, sample_blend_closest_points_fused
from .mlp_pallas import fused_skip_mlp, make_fused_skip_mlp
from .pointnet2 import (
    furthest_point_sample,
    gather_points,
    ball_query,
    group_points,
    three_nn,
    three_interpolate,
    interpolation_weights,
)
from .rasterize import rasterize_points
