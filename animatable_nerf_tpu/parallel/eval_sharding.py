"""Multi-chip evaluation: the whole-image render sweep sharded over the
device mesh.

This is the workload's "long-context" axis (SURVEY.md §2.9): eval renders
H*W rays x N_samples points (up to ~3.3e7 point queries per frame at
512^2), which the reference serializes through a 2048-ray Python chunk
loop on one GPU (tpose_renderer.py:170-181). Here the padded ray batch is
sharded over the mesh's data axis with shard_map; every device runs the
same fused render program on its shard and the image is re-assembled by
the out_specs — no collectives needed (rays are embarrassingly parallel;
params/frame are replicated).
"""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..render.renderer import RenderSettings, render_image, pad_rays

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def render_image_sharded(
    model,
    params,
    rays: dict,
    frame: dict,
    settings: RenderSettings,
    mesh: Mesh,
    axis: str = "dp",
    novel_pose: bool = False,
):
    """Render a ray batch with the ray axis sharded over `mesh[axis]`.

    rays: un-padded per-ray dict. Returns (outputs dict, n_valid).
    """
    n_dev = mesh.shape[axis]
    tile = settings.eval_tile
    n = rays["ray_o"].shape[0]
    per_dev = -(-n // (n_dev * tile)) * tile
    padded, n_valid = pad_rays(rays, per_dev * n_dev)

    ray_specs = {k: P(axis) for k in padded}

    def shard_fn(params, frame, shard_rays):
        return render_image(
            model, params, shard_rays, frame, settings,
            novel_pose=novel_pose,
        )

    def shard_fn_wrapped(params, frame, shard_rays):
        out = shard_fn(params, frame, shard_rays)
        # scalar flags cannot shard over dp; lift to (1,)
        import jax.numpy as jnp

        for k in ("compact_overflow", "compact_count"):
            if k in out:
                out[k] = jnp.reshape(out[k], (1,))
        return out

    # run one abstract eval to learn the output keys
    import jax as _jax

    abstract = _jax.eval_shape(
        shard_fn,
        _jax.tree_util.tree_map(
            lambda x: _jax.ShapeDtypeStruct(x.shape, x.dtype), params
        ),
        _jax.tree_util.tree_map(
            lambda x: _jax.ShapeDtypeStruct(x.shape, x.dtype), frame
        ),
        _jax.tree_util.tree_map(
            lambda x: _jax.ShapeDtypeStruct(
                (x.shape[0] // n_dev, *x.shape[1:]), x.dtype
            ),
            padded,
        ),
    )
    out_specs = {k: P(axis) for k in abstract}

    fn = _shard_map(
        shard_fn_wrapped,
        mesh=mesh,
        in_specs=(P(), P(), ray_specs),
        out_specs=out_specs,
        check_vma=False,
    )
    out = fn(params, frame, padded)
    if "compact_overflow" in out:
        out["compact_overflow"] = out["compact_overflow"].any()
    if "compact_count" in out:
        out["compact_count"] = out["compact_count"].max()
    return out, n_valid
