"""Shared masked-compute helpers for the model layer."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def keep_mask_with_argmin(norm_vals, threshold):
    """mask = norm_vals < threshold, with the global argmin point forced on.

    Reproduces the reference's `pind[arange, pnorm.argmin()] = True`
    keep-at-least-one hack (tpose_nerf_network.py:153-154,
    anisdf_pdf_network.py:173-174) so numerics match even when no point
    passes the threshold.
    """
    # non-finite distances (filter math at garbage coordinates) must
    # never win the argmin forcing — argmin propagates NaN as "minimum"
    norm_vals = jnp.where(jnp.isfinite(norm_vals), norm_vals, jnp.inf)
    mask = norm_vals < threshold
    forced = jax.nn.one_hot(jnp.argmin(norm_vals), norm_vals.shape[-1], dtype=bool)
    return mask | forced


def substitute_masked(pose_pts, pind, safe_point):
    """Replace masked-out rows with a benign in-body point before the
    bw-field/LBS warp (the double-where trick).

    The reference never evaluates filtered points at all — it boolean-
    gathers the survivors first (aligned_aninerf_lbw_network.py:74-78,
    tpose_nerf_network.py:149-163). The TPU dense path computes
    everything and masks afterwards, which exposes the warp to far
    out-of-shell points: nothing constrains the learned bw softmax
    there, and a drifted blend of bone rotations can go singular, so the
    analytic LBS inverse emits inf/NaN that poisons the whole loss
    through `masked_mean` (nan*0 = nan in both the primal and the
    cotangent) — observed in practice as every parameter turning NaN in
    one training step. Substituting the masked-out coordinates is
    exactly loss-preserving (their raw is value-masked to 0 and the loss
    masks are stop-gradient functions of geometry only) while keeping
    every op on the path finite."""
    return jnp.where(pind[:, None], pose_pts, safe_point)


def apply_chunked_rows(fn, *arrays, chunk: int = 131072):
    """Apply a row-wise function over fixed-size row chunks via lax.map.

    `arrays` share their leading (row) dimension; `fn(*chunks)` returns
    an array or pytree whose leaves all lead with the row dimension.
    Rows are zero-padded to a chunk multiple and the pad is sliced off.
    Numerically exact for row-wise math.

    Exists as the reference oracle for the TPU trunk-miscompile guard
    (render/renderer.py `apply_model` + RenderSettings.dense_chunk_rows;
    band diagnosis in tools/check_tpu_trunk_numerics.py).
    """
    n = arrays[0].shape[0]
    if n <= chunk:
        return fn(*arrays)
    n_chunks = -(-n // chunk)
    pad = n_chunks * chunk - n

    def prep(a):
        if pad:
            a = jnp.pad(a, [(0, pad)] + [(0, 0)] * (a.ndim - 1))
        return a.reshape(n_chunks, chunk, *a.shape[1:])

    out = jax.lax.map(lambda xs: fn(*xs), tuple(prep(a) for a in arrays))
    return jax.tree_util.tree_map(
        lambda o: o.reshape(n_chunks * chunk, *o.shape[2:])[:n], out
    )


def grid_pdist_keep(pose_pts, frame, threshold):
    """Conservative pass-1 keep mask from the per-frame packed
    nearest-vertex distance grid (ops/knn_pallas.py
    `build_pdist_payload`; present in `frame` only when the engine
    attached it).

    keep is a certified SUPERSET of {min-dist < threshold} and hence of
    the exact IDW-weighted filter set (weighted mean of the 5 nearest
    >= min) — callers re-apply the exact filter on the compacted
    survivors, exactly like the min-distance pass-1 it replaces. The
    bound is the 8-corner Lipschitz maximum (core/grid.py
    grid_corner_distance_bound: exact at grid nodes, tighter than
    trilerp-minus-half-diagonal — measured conservative keep 20.8% vs
    24.0% at the representative scene), minus the border-clamp excess
    for points outside the grid (d(x) >= d(clamp(x)) - |x - clamp(x)|),
    with 1e-5 absolute slack for f32 arithmetic.

    Forced-argmin caveat (shared with the min-distance pass-1 and the
    segment pre-filters): in a batch where NO point passes the filter,
    the forced point is the argmin of the BOUND, which may be a
    different — equally out-of-shell — point than the dense path's
    exact-distance argmin (and an arbitrary point if every sample is
    outside the padded grid bounds). At most one sample differs, and
    only in empty batches.
    """
    from ..core.grid import grid_corner_distance_bound

    mn, mx = frame["pdist_bounds"][0], frame["pdist_bounds"][1]
    res_cells = jnp.asarray(frame["pdist_packed"].shape[:3], jnp.float32)
    cell = (mx - mn) / res_cells
    pts01 = (pose_pts - mn) / (mx - mn)
    lb = grid_corner_distance_bound(frame["pdist_packed"], pts01, cell)
    # border-clamp excess: outside points read the clamped cell's
    # corners, whose |x - corner| was computed from the CLAMPED frac
    excess = jnp.linalg.norm(
        jnp.maximum(jnp.maximum(mn - pose_pts, pose_pts - mx), 0.0),
        axis=-1,
    )
    lb = lb - excess
    # bbox pre-mask (exact-conservative): every vertex lies inside the
    # grid bounds, so a point farther than `threshold` outside them
    # cannot pass the true filter — this prunes far out-of-bounds points
    # (e.g. the renderer's far-away pad rays)
    inside = inside_bounds(pose_pts, frame["pdist_bounds"], pad=threshold)
    return keep_mask_with_argmin(
        jnp.where(inside, lb, jnp.inf), threshold + 1e-5
    )


def grid_d5_upper(pose_pts, frame):
    """Certified per-point UPPER bound of the 5th-nearest-vertex
    distance from the per-frame d5 payload (ops/knn_pallas.py
    build_d5_payload; attached by the engine as `d5_packed` alongside
    the blocked-KNN tensors). Drives the blocked kernel's tile-radius
    cull: a vertex block farther than this bound from a query cannot
    hold any of its 5 nearest."""
    from ..core.grid import grid_corner_distance_upper

    mn, mx = frame["pdist_bounds"][0], frame["pdist_bounds"][1]
    res_cells = jnp.asarray(frame["d5_packed"].shape[:3], jnp.float32)
    cell = (mx - mn) / res_cells
    pts01 = (pose_pts - mn) / (mx - mn)
    ub = grid_corner_distance_upper(frame["d5_packed"], pts01, cell)
    excess = jnp.linalg.norm(
        jnp.maximum(jnp.maximum(mn - pose_pts, pose_pts - mx), 0.0),
        axis=-1,
    )
    return ub + excess + 1e-5


def knn_blend_for_frame(pose_pts, frame):
    """Pass-2 KNN dispatch: the block-culled kernel when the engine
    attached the blocked tensors (knn_verts/knn_values/knn_bboxes +
    d5_packed), the flat fused kernel / XLA twin otherwise. Same
    contract as core.knn.sample_blend_closest_points; identical output
    up to index tie-breaks (the blocked kernel tie-breaks in Morton
    order)."""
    from ..ops.knn_pallas import (
        knn_blend_blocked, sample_blend_closest_points_fused,
    )

    if "knn_verts" in frame and jax.default_backend() == "tpu":
        d5ub = grid_d5_upper(pose_pts, frame)
        return knn_blend_blocked(
            pose_pts, d5ub, frame["knn_verts"], frame["knn_values"],
            frame["knn_bboxes"],
        )
    return sample_blend_closest_points_fused(
        pose_pts, frame["pvertices"], frame["weights"]
    )


def inside_bounds(pts, bounds, pad: float = 0.0):
    """All-axes AABB membership: (N, 3), (2, 3) -> (N,) bool.

    Strict inequalities as in the reference (tpose_nerf_network.py:186-188).
    """
    lo = bounds[0] - pad
    hi = bounds[1] + pad
    return jnp.all((pts > lo) & (pts < hi), axis=-1)


def broadcast_viewdirs(viewdir, n_samples):
    """(R, 3) ray dirs -> (R*S, 3) per-sample dirs."""
    return jnp.broadcast_to(
        viewdir[:, None, :], (viewdir.shape[0], n_samples, 3)
    ).reshape(-1, 3)


def raw_alpha_from_sigma(sigma, dists):
    """alpha = 1 - exp(-relu(sigma) * dists) (tpose_nerf_network.py:201)."""
    return 1.0 - jnp.exp(-jax.nn.relu(sigma) * dists)


def survivor_count(pind):
    """(1,)-shaped true survivor count (pre-capacity-truncation).

    Returned as `compact_count` from the compacted eval paths so the
    engine's adaptive capacity ladder (engine.render_item) can pick the
    smallest capacity that fits the scene; (1,)-shaped so it survives
    sharded-eval out_specs like `compact_overflow`.
    """
    return jnp.reshape(jnp.sum(pind.astype(jnp.int32)), (1,))


def volume_lipschitz_bound(vol, bounds):
    """Certified Lipschitz bound of a trilinearly-interpolated volume.

    vol (D, H, W) scalar samples on a uniform grid over `bounds` (2, 3).
    The interpolant's per-axis derivative is bounded by the max adjacent
    -sample difference over the cell size, so for per-axis bounds L_i,
    |f(x) - f(y)| <= sum_i L_i |dx_i| <= ||L||_2 ||dx||_2.
    For a true distance field every L_i ~ 1 and the bound ~ sqrt(3).
    Used to make the segment pre-filter provably conservative without
    trusting the data to be a metric distance.
    """
    sizes = jnp.array(vol.shape, dtype=vol.dtype)
    cell = (bounds[1] - bounds[0]) / jnp.maximum(sizes - 1.0, 1.0)
    lx = jnp.max(jnp.abs(jnp.diff(vol, axis=0))) / cell[0]
    ly = jnp.max(jnp.abs(jnp.diff(vol, axis=1))) / cell[1]
    lz = jnp.max(jnp.abs(jnp.diff(vol, axis=2))) / cell[2]
    return jnp.sqrt(lx * lx + ly * ly + lz * lz)


def segment_prefilter(ray_o, ray_d, z_vals, mid_dist_fn, threshold,
                      lip_bound, seg: int, seg_capacity: int):
    """Conservative segment-level pre-filter for the compacted eval path.

    Splits each ray's S samples into S/seg consecutive segments and
    tests each segment ONCE at its midpoint: the segment can contain an
    exact survivor only if

        mid_dist < threshold + lip_bound * half_extent

    where half_extent is the world distance from the midpoint to the
    segment's farthest sample and `lip_bound` a Lipschitz bound of the
    distance field (exactly 1 for point-cloud/KNN distance since
    d(., V) is 1-Lipschitz; `volume_lipschitz_bound` for grid fields;
    rigid world->pose warps preserve it). The surviving segments are a
    SUPERSET of the segments containing exact survivors, so callers
    re-apply the exact per-point filter on the expanded candidates and
    the final survivor set equals the dense path's.

    Deviation from keep_mask_with_argmin (documented): in a frame where
    NO point passes the threshold, the reference still evaluates the
    single argmin point; here the forced segment is the one with the
    lowest possible bound, whose pass-2 argmin may be a different —
    equally out-of-shell — point. At most one sample of an empty frame
    differs.

    Returns (seg_sidx (seg_capacity,) int32 surviving segment indices,
    ascending with sentinel n_segments on dead slots; seg_valid bool;
    seg_count () true surviving-segment count pre-truncation).
    """
    n_rays, S = z_vals.shape
    per_ray = S // seg
    n_segments = n_rays * per_ray
    zs = z_vals.reshape(n_rays, per_ray, seg)
    z_mid = 0.5 * (zs[..., 0] + zs[..., -1])
    half = 0.5 * (zs[..., -1] - zs[..., 0])
    # z units are world units only for unit ray dirs; scale by |d|
    half = half * jnp.linalg.norm(ray_d, axis=-1)[:, None]
    mid = ray_o[:, None, :] + ray_d[:, None, :] * z_mid[..., None]
    d_mid = mid_dist_fn(mid.reshape(-1, 3))
    bound = d_mid - lip_bound * half.reshape(-1)  # lowest possible dist
    keep = keep_mask_with_argmin(bound, threshold)
    return compact_segments(keep, seg_capacity, n_segments)


def compact_segments(keep, seg_capacity: int, n_segments: int):
    """Fixed-capacity compaction of a segment keep mask.

    Shared tail of the segment pre-filters: returns (seg_sidx
    (seg_capacity,) int32 surviving segment indices, ascending with
    sentinel n_segments on dead slots; seg_valid bool; seg_count ()
    true surviving-segment count pre-truncation).
    """
    idx, n_kept = compact_indices(keep, seg_capacity)
    slot = jax.lax.broadcasted_iota(jnp.int32, (seg_capacity, 1), 0)[:, 0]
    seg_valid = slot < n_kept
    seg_sidx = jnp.where(seg_valid, idx, n_segments)
    seg_count = jnp.sum(keep.astype(jnp.int32))
    return seg_sidx, seg_valid, seg_count


# Sentinel "infinity" for slab boxes: far beyond any scene coordinate or
# ray parameter, small enough that f32 slab arithmetic stays finite.
_SLAB_BIG = 1e8
# Absolute world-space box inflation absorbing f32 rounding of the slab
# arithmetic and of the renderer's wpts = ray_o + viewdir * z recompute
# (scene scale is ~1 unit; f32 noise is ~1e-6).
_SLAB_EPS = 1e-4


def occupied_supercell_boxes(dist_vol, bounds, threshold,
                             supercell: int, capacity: int):
    """Conservative occupied-supercell AABBs of a trilerp distance volume.

    dist_vol (D, H, W) sampled over `bounds` (2, 3) with the grid_sample
    convention of core/grid.py (axis 0 indexed by x, align_corners=True,
    border padding). A point p can have trilerp(p) < threshold only if
    its containing cell has min(corner values) < threshold: the
    interpolant is multilinear, so its extremum over a cell is attained
    at a corner — an EXACT conservative cell set, no Lipschitz margin.
    Cells are grouped into supercell^3 blocks; occupied blocks compact
    to `capacity` world-space boxes (lo, hi).

    Border padding means an out-of-bounds point samples the border cell,
    so boxes touching the volume boundary extend to +-_SLAB_BIG along
    the clamped axes. Boxes are inflated by _SLAB_EPS against f32
    rounding. Dead slots return never-hit boxes (lo > hi).

    Returns (lo (capacity, 3), hi (capacity, 3), overflow (1,) bool).
    On overflow some occupied blocks were dropped and the box set is NOT
    conservative — callers must keep every segment in that case.
    """
    D, H, W = dist_vol.shape
    cmin = jnp.minimum(dist_vol[:-1], dist_vol[1:])
    cmin = jnp.minimum(cmin[:, :-1], cmin[:, 1:])
    cmin = jnp.minimum(cmin[:, :, :-1], cmin[:, :, 1:])
    occ = cmin < threshold  # (D-1, H-1, W-1) cells
    cells = jnp.array([D - 1, H - 1, W - 1], jnp.int32)
    s = supercell
    nd, nh, nw = [-(-int(c) // s) for c in (D - 1, H - 1, W - 1)]
    occ = jnp.pad(
        occ,
        [(0, nd * s - (D - 1)), (0, nh * s - (H - 1)), (0, nw * s - (W - 1))],
    )
    sup = occ.reshape(nd, s, nh, s, nw, s).any(axis=(1, 3, 5)).reshape(-1)

    idx, n_kept = compact_indices(sup, capacity)
    slot = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    valid = slot < n_kept
    i = idx // (nh * nw)
    j = (idx // nw) % nh
    k = idx % nw
    lo_c = jnp.stack([i, j, k], axis=-1) * s
    hi_c = jnp.minimum(lo_c + s, cells[None, :])

    cell_size = (bounds[1] - bounds[0]) / (
        jnp.array([D, H, W], dist_vol.dtype) - 1.0
    )
    lo = bounds[0] + lo_c.astype(dist_vol.dtype) * cell_size - _SLAB_EPS
    hi = bounds[0] + hi_c.astype(dist_vol.dtype) * cell_size + _SLAB_EPS
    # border clamping: extend boundary-touching faces to infinity
    lo = jnp.where(lo_c == 0, -_SLAB_BIG, lo)
    hi = jnp.where(hi_c == cells[None, :], _SLAB_BIG, hi)
    # dead slots: lo > hi on every axis -> slab never hits
    lo = jnp.where(valid[:, None], lo, _SLAB_BIG)
    hi = jnp.where(valid[:, None], hi, -_SLAB_BIG)
    overflow = jnp.reshape(jnp.sum(sup.astype(jnp.int32)) > capacity, (1,))
    return lo, hi, overflow


def slab_span(ray_o, ray_d, lo, hi, chunk: int = 512):
    """Per-ray union span of slab intersections with a set of AABBs.

    ray_o/ray_d (R, 3); lo/hi (B, 3). Returns (span_lo, span_hi) (R,):
    the smallest entry and largest exit ray parameter over all boxes the
    ray hits (t in the same units as z_vals: point = ray_o + t*ray_d).
    Rays hitting nothing get (+inf, -inf). Scans the boxes in chunks so
    the (R, chunk) slab tensors stay fused into their min/max reduces.
    """
    B = lo.shape[0]
    n_chunks = max(1, -(-B // chunk))
    pad = n_chunks * chunk - B
    if pad:
        lo = jnp.concatenate(
            [lo, jnp.full((pad, 3), _SLAB_BIG, lo.dtype)], axis=0
        )
        hi = jnp.concatenate(
            [hi, jnp.full((pad, 3), -_SLAB_BIG, hi.dtype)], axis=0
        )
    inv = 1.0 / jnp.where(jnp.abs(ray_d) < 1e-12, 1e-12, ray_d)

    pos = (inv >= 0)[:, None, :]

    def body(carry, box):
        blo, bhi = box  # (chunk, 3)
        t0 = (blo[None, :, :] - ray_o[:, None, :]) * inv[:, None, :]
        t1 = (bhi[None, :, :] - ray_o[:, None, :]) * inv[:, None, :]
        # pick enter/exit by the DIRECTION SIGN, not by value: dead
        # slots are lo > hi boxes, and a value sort (min/max) would
        # re-order them into infinite boxes that hit every ray
        enter = jnp.where(pos, t0, t1).max(-1)  # (R, chunk)
        exit_ = jnp.where(pos, t1, t0).min(-1)
        hit = exit_ >= enter
        enter = jnp.where(hit, enter, jnp.inf)
        exit_ = jnp.where(hit, exit_, -jnp.inf)
        span_lo, span_hi = carry
        return (
            jnp.minimum(span_lo, enter.min(-1)),
            jnp.maximum(span_hi, exit_.max(-1)),
        ), None

    n = ray_o.shape[0]
    init = (jnp.full((n,), jnp.inf), jnp.full((n,), -jnp.inf))
    (span_lo, span_hi), _ = jax.lax.scan(
        body, init,
        (lo.reshape(n_chunks, chunk, 3), hi.reshape(n_chunks, chunk, 3)),
    )
    return span_lo, span_hi


def slab_segment_keep(span_lo, span_hi, z_vals, seg: int):
    """Segment keep mask from per-ray slab spans.

    A sample at parameter z can pass the exact filter only if it lies
    inside an occupied box, hence z in [span_lo, span_hi] of its ray; a
    segment of `seg` consecutive samples can contain a survivor only if
    its [z_first, z_last] overlaps the span. At least one segment is
    force-kept so downstream compaction never runs empty (empty-frame
    forced-argmin caveat as in segment_prefilter).

    Returns (n_rays * S/seg,) bool, flattened row-major like z_vals.
    """
    n_rays, S = z_vals.shape
    zs = z_vals.reshape(n_rays, S // seg, seg)
    keep = (span_lo[:, None] <= zs[..., -1]) & (span_hi[:, None] >= zs[..., 0])
    keep = keep.reshape(-1)
    return keep | jax.nn.one_hot(jnp.argmax(keep), keep.shape[0], dtype=bool)


def take_rows(arr, idx):
    """Sorted gather with out-of-bounds sentinel rows filled with 0."""
    return arr.at[idx].get(
        mode="fill", fill_value=0, indices_are_sorted=True
    )


def compact_indices(keep, capacity: int):
    """Stable fixed-capacity compaction of a boolean mask.

    Returns (idx (capacity,) int32, n_kept ()) where idx[j] is the j-th
    True position of `keep` (ascending); slots beyond n_kept hold
    arbitrary dropped positions (callers MUST mask with j < n_kept).
    When more than `capacity` points are kept, the later ones are
    dropped.

    This is the TPU answer to the reference's dynamic boolean
    compaction (`pose_pts[pind]`, tpose_nerf_network.py:158-161): a
    static-shape survivor list that downstream stages (MLPs, warps)
    run on instead of the full point set. Three formulations measured
    on v5e at eval point counts: cumsum+scatter 163 ms/16.8M (XLA TPU
    scatter serializes per source row), one-bit-key stable argsort
    57 ms, and the round-4 hierarchical rank search (used at tile
    sizes, _compact_indices_hier) which replaces the sort with cumsums
    + vectorized rank compares + 3 capacity-row gathers.
    """
    keep = keep.astype(jnp.bool_)
    return _compact_indices_sort(keep, capacity)


def _compact_indices_sort(keep, capacity: int):
    """argsort formulation — the production path."""
    order = jnp.argsort(~keep, stable=True).astype(jnp.int32)
    if capacity <= keep.shape[0]:
        idx = order[:capacity]
    else:  # capacity exceeds the point count (tiny inputs): zero-pad
        idx = jnp.pad(order, (0, capacity - keep.shape[0]))
    n_kept = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), capacity)
    return idx, n_kept


# hierarchical rank-search geometry: 32-point sub-blocks, 16 sub-blocks
# per block (512-point blocks)
_HIER_B2 = 32
_HIER_G = 16
_HIER_B1 = _HIER_B2 * _HIER_G


def _compact_indices_hier(keep, capacity: int):
    """Sort-free stable compaction: hierarchical cumsum + per-slot rank
    search (round 4; same contract as _compact_indices_sort, bit-equal
    on every valid slot).

    The one-bit-key argsort costs ~34 ms of the 156 ms whole-frame
    AniNeRF render (32 tiles x 524k keys, tools/bench_tiled_stages.py)
    — pure overhead for what is just 'index of the j-th set bit'. Here
    survivor counts are cumsum'd at 32-point sub-block and 512-point
    block granularity, and each output SLOT j finds its source point
    with vectorized rank comparisons instead of a sort or a binary
    search (TPU gathers cost per row, so a log-N searchsorted would pay
    ~20 gather rows per slot; this pays 3):

      block   b: #(block bases <= j) - 1   — (capacity, N/512)
               comparison matrix, pure VPU, no gather
      sub-blk s: same over the 16 in-block exclusive bases (one
               64-byte gathered row per slot)
      point  p: first position whose inclusive 32-cumsum equals the
               residual rank (one 128-byte gathered row per slot)

    Everything is a cumsum, a broadcast compare, or a capacity-row
    gather; no scatter (serializes per row on TPU) and no sort. Dead
    slots (j >= n_kept) resolve to clamped in-range positions and must
    be masked by the caller exactly as with the sort formulation.
    """
    n = keep.shape[0]
    n_pad = -(-n // _HIER_B1) * _HIER_B1
    k = jnp.pad(keep.astype(jnp.int32), (0, n_pad - n))
    s2 = n_pad // _HIER_B2
    s1 = n_pad // _HIER_B1
    incl2 = jnp.cumsum(k.reshape(s2, _HIER_B2), axis=1)
    cnt2 = incl2[:, -1]
    incl1 = jnp.cumsum(cnt2.reshape(s1, _HIER_G), axis=1)
    cnt1 = incl1[:, -1]
    base1 = jnp.concatenate(
        [jnp.zeros((1,), cnt1.dtype), jnp.cumsum(cnt1)[:-1]]
    )
    j = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    b = jnp.sum((base1[None, :] <= j[:, None]).astype(jnp.int32), axis=1) - 1
    # j ascending -> b/sb nondecreasing: sorted gathers
    jb = j - base1.at[b].get(indices_are_sorted=True)
    row1 = incl1.at[b].get(indices_are_sorted=True)  # (C, G) inclusive
    excl1 = jnp.concatenate(
        [jnp.zeros((capacity, 1), row1.dtype), row1[:, :-1]], axis=1
    )
    s = jnp.sum((excl1 <= jb[:, None]).astype(jnp.int32), axis=1) - 1
    r2 = jb - jnp.take_along_axis(excl1, s[:, None], axis=1)[:, 0]
    sb = b * _HIER_G + s
    row2 = incl2.at[sb].get(indices_are_sorted=True)  # (C, B2)
    match = row2 == (r2[:, None] + 1)
    pos = jnp.min(
        jnp.where(
            match,
            jax.lax.broadcasted_iota(jnp.int32, (1, _HIER_B2), 1),
            _HIER_B2,
        ),
        axis=1,
    )
    idx = sb * _HIER_B2 + jnp.minimum(pos, _HIER_B2 - 1)
    idx = jnp.minimum(idx, n - 1).astype(jnp.int32)
    n_kept = jnp.minimum(jnp.sum(keep.astype(jnp.int32)), capacity)
    return idx, n_kept


def compact_payload(keep, arrays, capacity: int):
    """Compact per-point arrays by a keep mask with static capacity.

    arrays: sequence of (N,) or (N, C) arrays sharing the point axis.
    Returns (sidx, slot_valid, compacted arrays, n): `sidx` routes dead
    slots to the sorted sentinel row n (use it for the scatter-back),
    and the compacted arrays are gathered in ONE fused pass.
    """
    a0 = arrays[0]
    n = a0.shape[0]
    idx, n_kept = compact_indices(keep, capacity)
    slot = jax.lax.broadcasted_iota(jnp.int32, (capacity, 1), 0)[:, 0]
    slot_valid = slot < n_kept
    sidx = jnp.where(slot_valid, idx, n)

    cols = [a if a.ndim == 2 else a[:, None] for a in arrays]
    widths = [c.shape[1] for c in cols]
    payload = jnp.pad(jnp.concatenate(cols, axis=-1), ((0, 1), (0, 0)))
    payload = payload.at[sidx].get(
        mode="fill", fill_value=0.0, indices_are_sorted=True
    )
    outs = []
    off = 0
    for a, w in zip(arrays, widths):
        col = payload[:, off : off + w]
        outs.append(col[:, 0] if a.ndim == 1 else col)
        off += w
    # (1,)-shaped so it survives sharded eval out_specs; True means
    # survivors were DROPPED (results are wrong — callers must fall back
    # to the dense path, see engine.render_item)
    overflow = jnp.full((1,), n_kept >= capacity) & jnp.full(
        (1,), jnp.sum(keep.astype(jnp.int32)) > capacity
    )
    return sidx, slot_valid, outs, n, overflow


def scatter_compacted_raw(raw_c, slot_valid, sidx, n, n_rays, n_samples):
    """Scatter compacted raw rows back into the dense (R, S, 4) layout;
    dead slots write zeros to the sentinel row, which is sliced away."""
    raw_c = jnp.where(slot_valid[:, None], raw_c, 0.0)
    raw = jnp.zeros((n + 1, raw_c.shape[1])).at[sidx].set(
        raw_c, mode="drop", indices_are_sorted=True
    )[:n]
    return raw.reshape(n_rays, n_samples, raw_c.shape[1])


def eval_capacity(n: int, keep_frac: float) -> int:
    return max(512, int(n * keep_frac) // 512 * 512)


def stage2_capacity(cap: int, ratio: float) -> int:
    """Capacity of the eval stage-2 re-compaction given the pass-1
    capacity `cap` (models/pdf.py _eval_compacted). Shared with the
    engine's rung steering: a rung fits a frame only if BOTH the pass-1
    capacity holds the conservative survivor count AND this stage-2
    capacity holds the exact (post-filter) count."""
    return max(512, int(cap * ratio) // 512 * 512)
