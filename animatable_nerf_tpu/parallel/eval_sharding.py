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
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..render.renderer import RenderSettings, render_image, pad_rays

try:  # jax >= 0.6 exposes shard_map at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map as _shard_map


def make_sharded_render(
    model,
    settings: RenderSettings,
    mesh: Mesh,
    axis: str = "dp",
    novel_pose: bool = False,
):
    """Jitted sharded whole-image render: fn(params, frame, padded_rays).

    `padded_rays` must already be padded so its length divides
    mesh.shape[axis] * settings.eval_tile (eval_rays / pad_rays do
    this). The returned callable is jit-cached by input shapes — build
    it ONCE per (model, settings) and reuse across frames/items; the
    shard_map and its out_specs are constructed at trace time.
    """
    n_dev = mesh.shape[axis]

    def shard_fn(params, frame, shard_rays):
        out = render_image(
            model, params, shard_rays, frame, settings,
            novel_pose=novel_pose,
        )
        # scalar flags cannot shard over dp; lift to (1,)
        for k in ("compact_overflow", "compact_count",
                  "compact_count_exact"):
            if k in out:
                out[k] = jnp.reshape(out[k], (1,))
        return out

    @jax.jit
    def fn(params, frame, padded):
        ray_specs = {k: P(axis) for k in padded}
        abstract = jax.eval_shape(
            shard_fn,
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
            ),
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), frame
            ),
            jax.tree_util.tree_map(
                lambda x: jax.ShapeDtypeStruct(
                    (x.shape[0] // n_dev, *x.shape[1:]), x.dtype
                ),
                padded,
            ),
        )
        out_specs = {k: P(axis) for k in abstract}
        out = _shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(), P(), ray_specs),
            out_specs=out_specs,
            check_vma=False,
        )(params, frame, padded)
        if "compact_overflow" in out:
            out["compact_overflow"] = out["compact_overflow"].any()
        for k in ("compact_count", "compact_count_exact"):
            if k in out:
                # per-device worst-tile counts -> global worst tile
                out[k] = out[k].max()
        return out

    return fn


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
    One-shot convenience wrapper over `make_sharded_render` (the engine
    caches the built program per capacity rung instead).
    """
    n_dev = mesh.shape[axis]
    tile = settings.eval_tile
    n = rays["ray_o"].shape[0]
    per_dev = -(-n // (n_dev * tile)) * tile
    padded, n_valid = pad_rays(rays, per_dev * n_dev)
    fn = make_sharded_render(
        model, settings, mesh, axis=axis, novel_pose=novel_pose
    )
    return fn(params, frame, padded), n_valid
