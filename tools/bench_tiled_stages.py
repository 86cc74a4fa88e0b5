"""Stage-timing breakdown of the PRODUCTION tiled eval program
(render_image: lax.map over 8192-ray tiles, per-tile compaction) at the
quantized capacity rung the official bench lands on — VERDICT-r3 item 2
asks where the ~156 ms AniNeRF frame actually goes before attacking it.

Each stage is a cumulative prefix of the per-tile pipeline, wrapped in
the same lax.map-over-32-tiles structure as render_image, so per-stage
deltas are directly attributable (same fusion context, same dispatch
floor). Prints a table; BASELINE.md carries the measured numbers.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_tiled_stages.py
"""

from __future__ import annotations

import time

import numpy as np

N_RAYS = 262144
N_SAMPLES = 64
TILE = 8192
KEEP_FRAC = None  # None -> probe the quantized rung like bench.py


def main():
    from animatable_nerf_tpu import jaxenv

    jax = jaxenv.setup()
    import jax.numpy as jnp

    from animatable_nerf_tpu.core import world_points_to_pose_points
    from animatable_nerf_tpu.core.grid import (
        pack_corner_volume,
        pts_sample_blend_weights_packed,
    )
    from animatable_nerf_tpu.core.sampling import (
        stratified_z_vals,
        z_vals_to_pts,
        z_vals_to_dists,
    )
    from animatable_nerf_tpu.core import pose_points_to_tpose_points
    from animatable_nerf_tpu.models.common import (
        keep_mask_with_argmin,
        compact_payload,
        eval_capacity,
        broadcast_viewdirs,
        inside_bounds,
        raw_alpha_from_sigma,
    )
    from animatable_nerf_tpu.core.composite import composite_compacted
    from animatable_nerf_tpu.models import AniNeRF
    from animatable_nerf_tpu.render import RenderSettings
    from animatable_nerf_tpu.render.renderer import render_image
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"]).items()
    }
    model = AniNeRF(num_train_frames=60)
    settings = RenderSettings(n_samples=N_SAMPLES, perturb=False,
                              eval_tile=TILE)
    z = jnp.ones((N_RAYS, N_SAMPLES))
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )
    )()

    # quantized rung, exactly like bench.py
    keep_frac = KEEP_FRAC
    if keep_frac is None:
        probe = jax.jit(
            lambda p, r: render_image(model, p, r, frame, settings)[
                "compact_count"
            ]
        )
        count = int(np.asarray(probe(params, rays)))
        need = int(count * 1.15) + 1
        pts_per_tile = TILE * N_SAMPLES
        cap_max = eval_capacity(pts_per_tile, model.eval_keep_frac)
        cap_q = min(-(-need // 4096) * 4096, cap_max)
        keep_frac = (
            (cap_q + 256) / pts_per_tile if cap_q < cap_max
            else model.eval_keep_frac
        )
        print(f"probe: worst-tile survivors {count}, rung keep_frac "
              f"{keep_frac:.4f} (cap {cap_q})")
    model = model.clone(eval_keep_frac=keep_frac)
    cap = eval_capacity(TILE * N_SAMPLES, keep_frac)

    n_tiles = N_RAYS // TILE
    tiled_keys = ("ray_o", "ray_d", "near", "far")

    def tiles_of(r):
        return {
            k: r[k].reshape(n_tiles, TILE, *r[k].shape[1:])
            for k in tiled_keys
        }

    # ---- per-tile pipeline prefixes --------------------------------
    dist_packed_bf16, th1 = model._conservative_dist_rows(frame)
    pbw_packed = pack_corner_volume(frame["pbw"])
    bw_params = {"params": params["params"]["bw_field"]}
    nerf_params = {"params": params["params"]["tpose_human"]}
    from animatable_nerf_tpu.fields import BlendWeightField, TPoseNeRF

    bw_field = BlendWeightField(num_latents=model.num_train_frames + 1,
                                xyz_res=model.xyz_res)
    tpose_nerf = TPoseNeRF(num_latents=model.num_train_frames,
                           xyz_res=model.xyz_res, view_res=model.view_res)

    def geometry(chunk):
        z_vals = stratified_z_vals(
            chunk["near"], chunk["far"], N_SAMPLES, key=None, perturb=False
        )
        wpts = z_vals_to_pts(chunk["ray_o"], chunk["ray_d"], z_vals)
        pose_pts = world_points_to_pose_points(
            wpts.reshape(-1, 3), frame["R"], frame["Th"]
        )
        return z_vals, pose_pts

    def stage_geometry(chunk):
        z_vals, pose_pts = geometry(chunk)
        return jnp.sum(pose_pts), jnp.sum(z_vals)

    def pass1(chunk):
        z_vals, pose_pts = geometry(chunk)
        pnorm = pts_sample_blend_weights_packed(
            pose_pts, dist_packed_bf16, frame["pbounds"], n_channels=1
        )[..., 0]
        pind = keep_mask_with_argmin(pnorm, th1)
        return z_vals, pose_pts, pind

    def stage_pass1(chunk):
        z_vals, pose_pts, pind = pass1(chunk)
        return jnp.sum(pind.astype(jnp.int32)), jnp.sum(z_vals)

    def compact(chunk):
        z_vals, pose_pts, pind = pass1(chunk)
        vd = broadcast_viewdirs(chunk["ray_d"], N_SAMPLES)
        dists = z_vals_to_dists(z_vals).reshape(-1)
        sidx, slot_valid, outs, n, overflow = compact_payload(
            pind, [pose_pts, vd, dists, z_vals.reshape(-1)], cap
        )
        return sidx, slot_valid, outs, pind

    def stage_compact(chunk):
        sidx, slot_valid, outs, _ = compact(chunk)
        return sum(jnp.sum(o) for o in outs), jnp.sum(sidx)

    def pass2_gather(chunk):
        sidx, slot_valid, (c_pose, c_vd, c_dists, c_z), pind = compact(chunk)
        c_init_pbw = pts_sample_blend_weights_packed(
            c_pose, pbw_packed, frame["pbounds"], n_channels=25
        )
        return sidx, slot_valid, c_pose, c_vd, c_dists, c_z, c_init_pbw

    def stage_pass2_gather(chunk):
        *_, c_init_pbw = pass2_gather(chunk)
        return jnp.sum(c_init_pbw), jnp.sum(c_init_pbw[..., 24])

    def bw_warp(chunk):
        sidx, slot_valid, c_pose, c_vd, c_dists, c_z, c_init_pbw = (
            pass2_gather(chunk)
        )
        pbw = bw_field.apply(
            bw_params, c_pose, c_init_pbw[..., :24], frame["latent_index"] + 1
        )
        tpose = pose_points_to_tpose_points(c_pose, pbw, frame["A"])
        return sidx, slot_valid, tpose, c_vd, c_dists, c_z, c_init_pbw

    def stage_bw_warp(chunk):
        *_, tpose, c_vd, c_dists, c_z, c_init_pbw = bw_warp(chunk)
        return jnp.sum(tpose), jnp.sum(c_z)

    def nerf(chunk):
        sidx, slot_valid, tpose, c_vd, c_dists, c_z, c_init_pbw = (
            bw_warp(chunk)
        )
        sigma, rgb_logits = tpose_nerf.apply(
            nerf_params, tpose, c_vd, frame["latent_index"]
        )
        return (sidx, slot_valid, tpose, sigma, rgb_logits, c_dists, c_z,
                c_init_pbw)

    def stage_nerf(chunk):
        *_, sigma, rgb_logits, c_dists, c_z, c_init_pbw = nerf(chunk)
        return jnp.sum(sigma), jnp.sum(rgb_logits)

    def stage_full_manual(chunk):
        (sidx, slot_valid, tpose, sigma, rgb_logits, c_dists, c_z,
         c_init_pbw) = nerf(chunk)
        sigma = jnp.where(inside_bounds(tpose, frame["tbounds"]), sigma, 0.0)
        c_pnorm = jnp.where(slot_valid, c_init_pbw[..., 24], jnp.inf)
        exact_keep = keep_mask_with_argmin(c_pnorm, model.norm_th)
        sigma = jnp.where(exact_keep, sigma, 0.0)
        alpha = raw_alpha_from_sigma(sigma, c_dists)
        rgb = jax.nn.sigmoid(rgb_logits)
        rgb_map, acc_map, depth_map = composite_compacted(
            sidx, slot_valid, rgb, alpha, c_z, TILE, N_SAMPLES,
        )
        return jnp.sum(rgb_map), jnp.sum(acc_map)

    def wrap(stage_fn):
        def full(r):
            outs = jax.lax.map(stage_fn, tiles_of(r))
            return sum(jnp.sum(o) for o in outs)
        return full

    def stage_production(r):
        out = render_image(model, params, r, frame, settings)
        return jnp.sum(out["rgb_map"]) + jnp.sum(out["acc_map"])

    variants = []
    for i in range(16):
        v = dict(rays)
        v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (i + 1))
        variants.append(v)

    results = []
    for name, fn in [
        ("geometry (sample+warp)", wrap(stage_geometry)),
        ("+ pass-1 bf16 trilerp+mask", wrap(stage_pass1)),
        ("+ compaction (sort+gather)", wrap(stage_compact)),
        ("+ pass-2 25ch gather", wrap(stage_pass2_gather)),
        ("+ bw MLP + LBS warp", wrap(stage_bw_warp)),
        ("+ canonical NeRF MLP", wrap(stage_nerf)),
        ("+ filters+composite (manual)", wrap(stage_full_manual)),
        ("production render_image", stage_production),
    ]:
        f = jax.jit(fn)
        for i in range(5):
            float(f(variants[i]))
        ts = []
        for i in range(8):
            t0 = time.perf_counter()
            float(f(variants[5 + i]))
            ts.append(time.perf_counter() - t0)
        med = float(np.median(ts)) * 1e3
        prev = results[-1][1] if results else 0.0
        results.append((name, med))
        print(f"{name:32s} {med:8.2f} ms   (+{med - prev:6.2f})")


if __name__ == "__main__":
    main()
