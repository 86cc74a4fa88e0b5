"""Multi-view visibility carving for novel-view / pose-sequence rendering.

Reference: lib/networks/renderer/tpose_renderer_mmsk.py:14-57
(`prepare_inside_pts`): a sample point is kept only if it projects into
the foreground mask of EVERY training view. The reference then gathers
the surviving points; here the mask multiplies the raw output
(render_rays's inside_fn hook) — static shapes.
"""

from __future__ import annotations

import jax.numpy as jnp


def prepare_inside_mask(pts, Ks, RTs, masks):
    """pts (N, 3); Ks (V, 3, 3); RTs (V, 3, 4); masks (V, H, W) ->
    inside (N,) bool.

    Projection and nearest-pixel lookup match the reference
    (tpose_renderer_mmsk.py:41-47): uv rounded to int and CLAMPED into
    the image — out-of-image projections read the border pixel rather
    than counting as outside.
    """
    V, H, W = masks.shape
    # world -> camera -> pixel, all views at once
    cam = jnp.einsum("vij,nj->vni", RTs[:, :, :3], pts) + RTs[:, None, :, 3]
    pix = jnp.einsum("vij,vnj->vni", Ks, cam)
    uv = pix[..., :2] / pix[..., 2:]
    u = jnp.round(uv[..., 0]).astype(jnp.int32)
    v = jnp.round(uv[..., 1]).astype(jnp.int32)
    uc = jnp.clip(u, 0, W - 1)
    vc = jnp.clip(v, 0, H - 1)
    # gather per view: flatten the (H, W) mask
    flat = masks.reshape(V, -1)
    vals = jnp.take_along_axis(flat, vc * W + uc, axis=1) > 0
    return jnp.all(vals, axis=0)


def make_inside_fn(Ks, RTs, masks):
    return lambda pts: prepare_inside_mask(pts, Ks, RTs, masks)
