"""Whole-frame in-situ ablation of the slab-prefilter eval pipeline:
time successive prefixes to see where the milliseconds go.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_slab_ablation.py
"""

from __future__ import annotations

import sys
import time

import numpy as np

N_RAYS = 262144
N_SAMPLES = 64
SEG = 8
KEEP_FRAC = 0.125


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.core import (
        world_points_to_pose_points, world_dirs_to_pose_dirs,
    )
    from animatable_nerf_tpu.core.grid import (
        pack_corner_volume, pts_sample_blend_weights_packed,
    )
    from animatable_nerf_tpu.core.sampling import (
        stratified_z_vals, z_vals_to_dists,
    )
    from animatable_nerf_tpu.models.common import (
        occupied_supercell_boxes, slab_span, slab_segment_keep,
        compact_segments, take_rows, keep_mask_with_argmin,
        compact_payload, eval_capacity,
    )
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"]).items()
    }
    n_pts = N_RAYS * N_SAMPLES
    n_segments = n_pts // SEG
    cap = eval_capacity(n_pts, KEEP_FRAC)
    seg_cap = eval_capacity(n_pts, min(1.0, 3 * KEEP_FRAC)) // SEG
    norm_th = 0.05

    def boxes(r):
        return occupied_supercell_boxes(
            frame["pbw"][..., 24], frame["pbounds"], norm_th, 4, 1024
        )

    def spans(r):
        lo, hi, _ = boxes(r)
        z_vals = stratified_z_vals(
            r["near"], r["far"], N_SAMPLES, key=None, perturb=False
        )
        pose_o = world_points_to_pose_points(
            r["ray_o"], frame["R"], frame["Th"]
        )
        pose_d = world_dirs_to_pose_dirs(r["ray_d"], frame["R"])
        return slab_span(pose_o, pose_d, lo, hi), z_vals

    def segkeep(r):
        (span_lo, span_hi), z_vals = spans(r)
        keep = slab_segment_keep(span_lo, span_hi, z_vals, SEG)
        return keep, z_vals

    def segcompact(r):
        keep, z_vals = segkeep(r)
        seg_sidx, seg_valid, seg_count = compact_segments(
            keep, seg_cap, n_segments
        )
        return seg_sidx, seg_valid, seg_count, z_vals

    def expand_zd(r):
        seg_sidx, seg_valid, seg_count, z_vals = segcompact(r)
        zd_pack = jnp.concatenate(
            [
                z_vals.reshape(n_segments, SEG),
                z_vals_to_dists(z_vals).reshape(n_segments, SEG),
            ],
            axis=-1,
        )
        c_zd = take_rows(zd_pack, seg_sidx)
        return c_zd, seg_sidx, seg_valid, seg_count

    def expand_ray(r):
        c_zd, seg_sidx, seg_valid, seg_count = expand_zd(r)
        ray_id = seg_sidx // (N_SAMPLES // SEG)
        c_ray = take_rows(
            jnp.concatenate([r["ray_o"], r["ray_d"]], axis=-1), ray_id
        )
        return c_ray, c_zd, seg_sidx, seg_valid, seg_count

    def expand(r):
        c_ray, c_zd, seg_sidx, seg_valid, seg_count = expand_ray(r)
        c_z_seg, c_dists_seg = c_zd[:, :SEG], c_zd[:, SEG:]
        c_o, c_d = c_ray[:, :3], c_ray[:, 3:]
        cand_w = c_o[:, None, :] + c_d[:, None, :] * c_z_seg[..., None]
        cand_pose = world_points_to_pose_points(
            cand_w.reshape(-1, 3), frame["R"], frame["Th"]
        )
        cand_valid = jnp.repeat(seg_valid, SEG)
        return (cand_pose, cand_valid, c_d, c_dists_seg, c_z_seg, seg_sidx,
                seg_count)

    def pass1b(r):
        (cand_pose, cand_valid, c_d, c_dists_seg, c_z_seg, seg_sidx,
         seg_count) = expand(r)
        dist_packed = pack_corner_volume(
            frame["pbw"][..., 24:25]
        ).astype(jnp.bfloat16)
        pnorm = pts_sample_blend_weights_packed(
            cand_pose, dist_packed, frame["pbounds"], n_channels=1
        )[..., 0].astype(jnp.float32)
        pnorm = jnp.where(cand_valid, pnorm, jnp.inf)
        keep_cand = keep_mask_with_argmin(pnorm, norm_th)
        return keep_cand, cand_pose, c_d, c_dists_seg, c_z_seg

    def pointsort(r):
        keep_cand, cand_pose, c_d, c_dists_seg, c_z_seg = pass1b(r)
        from animatable_nerf_tpu.models.common import compact_indices

        idx, n_kept = compact_indices(keep_cand, cap)
        return idx, n_kept

    def pointcompact(r):
        keep_cand, cand_pose, c_d, c_dists_seg, c_z_seg = pass1b(r)
        cand_vd = jnp.repeat(c_d, SEG, axis=0)
        sidx_c, slot_valid, outs, _, overflow = compact_payload(
            keep_cand,
            [cand_pose, cand_vd, c_dists_seg.reshape(-1),
             c_z_seg.reshape(-1)],
            cap,
        )
        return sidx_c, slot_valid, outs

    stages = [
        ("boxes only", lambda r: boxes(r)[0]),
        ("+ slab spans", lambda r: spans(r)[0][0]),
        ("+ segment keep", lambda r: segkeep(r)[0].astype(jnp.int32)),
        ("+ seg compaction", lambda r: segcompact(r)[0]),
        ("+ expand zd gather", lambda r: expand_zd(r)[0]),
        ("+ expand ray gather", lambda r: expand_ray(r)[0]),
        ("+ candidate expansion", lambda r: expand(r)[0]),
        ("+ pass-1b trilerp", lambda r: pass1b(r)[0].astype(jnp.int32)),
        ("+ point sort only", lambda r: pointsort(r)[0]),
        ("+ point compaction", lambda r: pointcompact(r)[2][0]),
    ]

    variants = []
    for i in range(16):
        v = dict(rays)
        v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (i + 1))
        variants.append(v)

    only = sys.argv[1:] or None
    for name, fn in stages:
        if only and not any(o in name for o in only):
            continue
        f = jax.jit(lambda r, fn=fn: jnp.sum(fn(r)))
        try:
            for i in range(5):
                float(f(variants[i]))
            ts = []
            for i in range(8):
                t0 = time.perf_counter()
                float(f(variants[5 + i]))
                ts.append(time.perf_counter() - t0)
            print(f"{name:26s} {float(np.median(ts)) * 1e3:8.2f} ms",
                  flush=True)
        except Exception as e:  # compile crashes: report and continue
            print(f"{name:26s} FAILED: {type(e).__name__}", flush=True)


if __name__ == "__main__":
    main()
