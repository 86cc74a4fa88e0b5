"""Jitted renderers: train-time fused ray batches, eval-time tiled
whole-image sweeps, visibility carving and mesh field sweeps."""

from .renderer import RenderSettings, render_rays, render_image, pad_rays
from .visibility import prepare_inside_mask
from .mesh import density_grid_sweep, marching_cubes
