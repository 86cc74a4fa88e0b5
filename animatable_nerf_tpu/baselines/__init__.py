"""Image-space baseline model families (SURVEY.md §2.3):

  NHR — point-cloud rendering: PointNet++ MSG features on the
        SMPL-warped vertex cloud, differentiable point splatting
        (ops.rasterize, replacing the PCPR CUDA rasterizer), and a
        gated-conv UNet refiner (lib/networks/nhr/*).
  NT  — Neural Texture: learnable multi-scale texture pyramid sampled
        by precomputed SMPL UV renders + the same UNet
        (lib/networks/nt/*).

TPU-native deviations from the reference (documented per module):
channels-last layouts, GroupNorm instead of BatchNorm (stateless,
shard-friendly — no cross-device batch-stat sync), ops/ kernels instead
of the CUDA extensions.
"""

from .pointnet2_msg import PointNet2MSG
from .unet import UNet
from .nhr import NHR
from .nt import NeuralTexture, NT
