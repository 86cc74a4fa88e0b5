"""Volume renderers.

The reference renders in a serial Python loop of 2048-ray chunks
(lib/networks/renderer/tpose_renderer.py:159-186) — the #1 structural
perf loss it has. Here:

  * `render_rays` — one fused program over a ray batch (training path:
    sample -> warp -> field -> composite in a single XLA computation).
  * `render_image` — whole-image eval as `lax.map` over fixed-size ray
    tiles inside ONE jitted program: bounded memory, no per-chunk
    dispatch, shapes static for the compiler.

Rays are padded to the tile size with a validity mask; padded rays
produce zeros and are dropped on the host side.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.sampling import stratified_z_vals, z_vals_to_pts
from ..core.composite import raw2outputs, get_intersection_mask, sample_pdf


class RenderSettings(NamedTuple):
    """Static (hashable) rendering options — jit-safe.

    n_importance > 0 enables live hierarchical importance sampling
    (coarse pass -> inverse-CDF resampling of the coarse weights -> fine
    pass over the sorted union). The reference declares N_importance in
    its configs but never calls sample_pdf (nerf_net_utils.py:40-75 is
    dead code) — here it is a working opt-in (`use_importance` in the
    config), sharing one network between passes.
    """

    n_samples: int = 64
    perturb: bool = True
    white_bkgd: bool = False
    eval_tile: int = 4096
    n_importance: int = 0
    # Max rows (rays x samples) per FLAT dense model call. The remote
    # XLA:TPU backend MISCOMPILES the weight-normalized field trunks for
    # flat row counts in a band around ~0.5M rows (measured garbage at
    # 524,287-589,824 rows, exact at <= 393,216 and at 1,048,576 —
    # tools/check_tpu_trunk_numerics.py re-maps it); the dense
    # whole-frame tile (8192 rays x 64 samples) sat exactly in the band
    # and rendered silently wrong images. Dense model calls above this
    # bound are applied per ray sub-chunk via lax.map — numerically
    # exact for the row-wise field math; the keep-at-least-one argmin /
    # argmax forcing acts per chunk rather than globally, which mirrors
    # the reference's own per-chunk forcing inside its 2048-ray chunk
    # loop (tpose_renderer.py:170-181): at eval the forced point is
    # masked out of raw, at train each chunk contributes its one forced
    # point to the bw-consistency loss exactly as the reference's chunks
    # do. Compacted calls are already bounded by their per-tile capacity
    # and are NOT re-chunked (capacity semantics). 0 disables.
    dense_chunk_rows: int = 131072


def pad_rays(rays: dict, multiple: int):
    """Pad every per-ray array to the next multiple; returns (rays, n_valid).

    Adds/extends a boolean 'mask' entry so downstream losses and image
    scatter ignore padding.
    """
    n = rays["ray_o"].shape[0]
    import numpy as np

    padded_n = int(np.ceil(n / multiple) * multiple)
    pad = padded_n - n
    out = {}
    for k, v in rays.items():
        if pad:
            widths = [(0, pad)] + [(0, 0)] * (v.ndim - 1)
            # pad ray origins FAR from the scene: zero-origin pad rays
            # sample the body center and masquerade as survivors,
            # inflating the compaction capacity the adaptive ladder
            # sizes for (their output is masked either way)
            cval = 1e4 if k == "ray_o" else 0
            v = np.pad(np.asarray(v), widths, constant_values=cval)
        out[k] = v
    mask = np.zeros(padded_n, dtype=bool)
    mask[:n] = rays.get("mask", np.ones(n, dtype=bool))
    out["mask"] = mask
    return out, n


def _model_call_is_dense(model, train: bool) -> bool:
    """True when this model call takes the dense masked path (no
    fixed-capacity survivor compaction)."""
    tkf = float(getattr(model, "train_keep_frac", 0.0) or 0.0)
    ekf = float(getattr(model, "eval_keep_frac", 0.0) or 0.0)
    return (train and tkf == 0.0) or (not train and ekf == 0.0)


def apply_model(model, params, wpts, ray_d, z_vals, frame, settings,
                train: bool, **kwargs):
    """model.apply, ray-chunked for large DENSE calls.

    See RenderSettings.dense_chunk_rows: the TPU backend miscompiles the
    field trunks for flat row counts in a band around ~0.5M, so dense
    calls above the bound run as a lax.map over ray sub-chunks (pad rays
    parked far from the scene; every model output leads with either the
    ray or the point axis, so chunk outputs re-flatten exactly)."""
    n_rays, n_samples = z_vals.shape
    bound = settings.dense_chunk_rows
    if (
        not bound
        or n_rays * n_samples <= bound
        or not _model_call_is_dense(model, train)
    ):
        return model.apply(
            params, wpts, ray_d, z_vals, frame, train=train, **kwargs
        )

    chunk = max(1, bound // n_samples)
    n_chunks = -(-n_rays // chunk)
    pad = n_chunks * chunk - n_rays

    def padded(a, cval):
        if not pad:
            return a
        widths = [(0, pad)] + [(0, 0)] * (a.ndim - 1)
        return jnp.pad(a, widths, constant_values=cval)

    # pad rays far from the scene (masked out by the point filters; a
    # zero-origin pad ray would sample the body center instead)
    wp = padded(wpts, 1e4).reshape(n_chunks, chunk, n_samples, 3)
    rd = padded(ray_d, 0.0).reshape(n_chunks, chunk, 3)
    zp = padded(z_vals, 0.0).reshape(n_chunks, chunk, n_samples)

    out = jax.lax.map(
        lambda args: model.apply(
            params, args[0], args[1], args[2], frame, train=train, **kwargs
        ),
        (wp, rd, zp),
    )

    def unchunk(leaf):
        if leaf.ndim >= 2 and leaf.shape[1] == chunk:
            flat = leaf.reshape(n_chunks * chunk, *leaf.shape[2:])
            return flat[:n_rays]
        if leaf.ndim >= 2 and leaf.shape[1] == chunk * n_samples:
            per_ray = leaf.reshape(
                n_chunks * chunk, n_samples, *leaf.shape[2:]
            )[:n_rays]
            return per_ray.reshape(n_rays * n_samples, *leaf.shape[2:])
        raise ValueError(
            f"chunked model output leaf with unexpected leading shape "
            f"{leaf.shape} (chunk {chunk}, n_samples {n_samples})"
        )

    return jax.tree_util.tree_map(unchunk, out)


def render_rays(
    model,
    params,
    rays: dict,
    frame: dict,
    settings: RenderSettings,
    key=None,
    train: bool = True,
    novel_pose: bool = False,
    inside_fn=None,
):
    """Render one ray batch. rays: ray_o/ray_d (R,3), near/far (R,),
    optional mask (R,), occupancy (R,).

    Returns the model dict plus rgb_map/acc_map/depth_map/weights and —
    for SDF models — the mask-loss tensors (min_sdf, sdf_free_mask,
    sdf_in_mask reproducing tpose_renderer.py:134-152 under masking).
    """
    ray_o, ray_d = rays["ray_o"], rays["ray_d"]
    near, far = rays["near"], rays["far"]

    z_vals = stratified_z_vals(
        near, far, settings.n_samples, key=key, perturb=settings.perturb and train
    )

    coarse_ovf = None
    coarse_count = None
    coarse_count_exact = None
    if settings.n_importance > 0:
        # hierarchical sampling: coarse raw pass -> inverse-CDF fine
        # z values concentrated where the coarse weights are
        coarse_kwargs = {"novel_pose": True} if novel_pose else {}
        coarse = apply_model(
            model, params, z_vals_to_pts(ray_o, ray_d, z_vals), ray_d,
            z_vals, frame, settings, train=train, **coarse_kwargs,
        )
        # the coarse pass's survivor compaction can overflow too —
        # propagate its flag/count so the engine ladder escalates
        # (silent coarse truncation corrupts the fine sample placement)
        coarse_ovf = coarse.get("compact_overflow")
        coarse_count = coarse.get("compact_count")
        coarse_count_exact = coarse.get("compact_count_exact")
        _, _, _, weights, _ = raw2outputs(
            coarse["raw"], z_vals, settings.white_bkgd
        )
        z_mid = 0.5 * (z_vals[..., 1:] + z_vals[..., :-1])
        fine_key = None if key is None else jax.random.fold_in(key, 1)
        z_fine = sample_pdf(
            z_mid, jax.lax.stop_gradient(weights[..., 1:-1]),
            settings.n_importance, key=fine_key,
            det=not (settings.perturb and train),
        )
        z_vals = jnp.sort(
            jnp.concatenate([z_vals, z_fine], axis=-1), axis=-1
        )

    wpts = z_vals_to_pts(ray_o, ray_d, z_vals)

    kwargs = {}
    if novel_pose:
        kwargs["novel_pose"] = True
    # compacted eval models carve visibility ON THE SURVIVOR STREAM
    # (cap x V mask gathers instead of R*S*V — the carve dominated
    # novel-view rendering: measured 3.9 s vs 0.16 s plain at
    # whole-frame scale with 20 views) and can then also composite on
    # the stream
    model_carve = (
        inside_fn is not None and not train
        and float(getattr(model, "eval_keep_frac", 0.0) or 0.0) > 0
    )
    if model_carve:
        kwargs["inside_fn"] = inside_fn
    if not train and (inside_fn is None or model_carve):
        # the compacted eval paths can composite directly on the
        # survivor stream (composite_compacted) instead of scattering
        # raw back densely; the dense-path visibility carve (below)
        # needs per-sample raw
        kwargs["precomposite"] = True
    if not train and settings.n_importance == 0:
        # z_vals is the plain affine stratified grid and wpts lies on
        # the rays — the promise the slab pre-filter's analytic winner
        # rebuild needs (models/aninerf.py _eval_slab)
        kwargs["analytic_z"] = True
    ret = apply_model(
        model, params, wpts, ray_d, z_vals, frame, settings,
        train=train, **kwargs
    )
    if coarse_ovf is not None:
        ret["compact_overflow"] = (
            ret["compact_overflow"] | coarse_ovf
            if "compact_overflow" in ret else coarse_ovf
        )
    if coarse_count is not None:
        ret["compact_count"] = (
            jnp.maximum(ret["compact_count"], coarse_count)
            if "compact_count" in ret else coarse_count
        )
    if coarse_count_exact is not None:
        ret["compact_count_exact"] = (
            jnp.maximum(ret["compact_count_exact"], coarse_count_exact)
            if "compact_count_exact" in ret else coarse_count_exact
        )

    if "raw" not in ret:
        # model pre-composited (rgb/acc/depth maps)
        rgb_map = ret["rgb_map"]
        acc_map = ret["acc_map"]
        depth_map = ret["depth_map"]
        if settings.white_bkgd:
            rgb_map = rgb_map + (1.0 - acc_map[..., None])
        if "mask" in rays:
            m = rays["mask"]
            rgb_map = jnp.where(m[:, None], rgb_map, 0.0)
            acc_map = jnp.where(m, acc_map, 0.0)
            depth_map = jnp.where(m, depth_map, 0.0)
        ret.update(
            rgb_map=rgb_map, acc_map=acc_map, depth_map=depth_map,
            z_vals=z_vals,
        )
        return ret

    raw = ret["raw"]
    if inside_fn is not None and not model_carve:
        # dense visibility carving (tpose_renderer_mmsk.py:14-57): zero
        # samples not seen by every training view
        vis = inside_fn(wpts.reshape(-1, 3)).reshape(raw.shape[:2])
        raw = raw * vis[..., None]
        ret["raw"] = raw

    rgb_map, disp_map, acc_map, weights, depth_map = raw2outputs(
        raw, z_vals, settings.white_bkgd
    )

    if "mask" in rays:
        m = rays["mask"]
        rgb_map = jnp.where(m[:, None], rgb_map, 0.0)
        acc_map = jnp.where(m, acc_map, 0.0)
        depth_map = jnp.where(m, depth_map, 0.0)

    ret.update(
        rgb_map=rgb_map,
        acc_map=acc_map,
        depth_map=depth_map,
        weights=weights,
        z_vals=z_vals,
    )

    if "sdf" in ret and "occupancy" in rays:
        # SDF silhouette supervision tensors (tpose_renderer.py:134-152):
        # rays outside the mask push min_sdf positive (label 0); rays
        # inside the mask with no sign change pull it negative (label 1).
        sdf = ret["sdf"]
        min_sdf = jnp.min(sdf, axis=-1)
        inter, _ = get_intersection_mask(sdf, z_vals)
        occ = rays["occupancy"]
        valid = rays.get("mask", jnp.ones_like(occ, dtype=bool))
        ret.update(
            msk_sdf=min_sdf,
            msk_free=(occ == 0) & valid,
            msk_in=(~inter) & (occ == 1) & valid,
        )
    return ret


# keys that are per-ray and must be tiled in the eval sweep
_RAY_KEYS = ("ray_o", "ray_d", "near", "far", "mask", "occupancy")
# per-ray outputs worth returning from an eval sweep
_IMAGE_OUTPUTS = ("rgb_map", "acc_map", "depth_map")


def render_image(
    model,
    params,
    rays: dict,
    frame: dict,
    settings: RenderSettings,
    novel_pose: bool = False,
    inside_fn=None,
):
    """Whole-image rendering: lax.map over fixed-size ray tiles inside one
    program. `rays` must already be padded to a multiple of
    settings.eval_tile (see pad_rays).
    """
    tile = settings.eval_tile
    n = rays["ray_o"].shape[0]
    n_tiles = n // tile
    assert n_tiles * tile == n, "pad rays to a multiple of eval_tile first"

    tiled = {
        k: rays[k].reshape(n_tiles, tile, *rays[k].shape[1:])
        for k in _RAY_KEYS
        if k in rays
    }

    def body(chunk):
        out = render_rays(
            model,
            params,
            chunk,
            frame,
            settings,
            key=None,
            train=False,
            novel_pose=novel_pose,
            inside_fn=inside_fn,
        )
        keep = {k: out[k] for k in _IMAGE_OUTPUTS}
        for k in ("compact_overflow", "compact_count",
                  "compact_count_exact"):
            if k in out:
                keep[k] = out[k]
        return keep

    out = jax.lax.map(body, tiled)
    result = {
        k: out[k].reshape(n, *out[k].shape[2:]) for k in _IMAGE_OUTPUTS
    }
    if "compact_overflow" in out:
        # (n_tiles, 1) -> any tile overflowed its survivor capacity
        result["compact_overflow"] = jnp.any(out["compact_overflow"])
    for k in ("compact_count", "compact_count_exact"):
        if k in out:
            # worst tile's survivor count: capacity is per tile, so this
            # is what the engine's adaptive ladder must fit
            result[k] = jnp.max(out[k])
    return result
