"""Neural field modules (flax.linen). Layer dims mirror the reference
architectures exactly (SURVEY.md §2.3) so PyTorch checkpoints convert
tensor-for-tensor."""

from .mlp import SkipMLP, WNDense, geometric_mlp_params
from .fields import (
    BlendWeightField,
    TPoseNeRF,
    ResidualField,
    GeometricFieldNetwork,
    ColorNetwork,
    BetaNetwork,
    SingleVarianceNetwork,
)
