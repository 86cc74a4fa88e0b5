"""In-situ ablation of the compacted eval render: time successive
prefixes of the pipeline at whole-frame scale (262144 rays x 64) to see
where the milliseconds go. Used to steer optimization (BASELINE.md
carries the measured numbers).

NOTE (session 5): this tool measures the FLAT render_rays formulation.
The production/bench path is now the TILED render_image program (lax.map
over 8192-ray tiles, per-tile compaction — 1.6x the flat program, see
BASELINE.md); stage ratios measured here still transfer approximately
(same per-point work, smaller per-tile sorts), but absolute times don't.

Run: PYTHONPATH=/root/.axon_site:/root/repo python tools/bench_eval_stages.py
"""

from __future__ import annotations

import time

import numpy as np

N_RAYS = 262144
N_SAMPLES = 64
KEEP_FRAC = 0.125  # the rung the representative scene lands on


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
    from animatable_nerf_tpu.models.common import (
        keep_mask_with_argmin,
        compact_payload,
        eval_capacity,
        broadcast_viewdirs,
    )
    from animatable_nerf_tpu.models import AniNeRF
    from animatable_nerf_tpu.render import RenderSettings, render_rays
    import __graft_entry__ as ge

    rng = np.random.RandomState(0)
    frame_np = ge._synthetic_frame(rng, grid_shape=(64, 64, 24))
    frame = {k: jnp.asarray(v) for k, v in frame_np.items()}
    rays = {
        k: jnp.asarray(v)
        for k, v in ge._rays(rng, N_RAYS, bounds=frame_np["pbounds"]).items()
    }
    model = AniNeRF(num_train_frames=60, eval_keep_frac=KEEP_FRAC)
    settings = RenderSettings(n_samples=N_SAMPLES, perturb=False)
    z = jnp.ones((N_RAYS, N_SAMPLES))
    params = jax.jit(
        lambda: model.init(
            jax.random.PRNGKey(0), jnp.zeros((*z.shape, 3)), rays["ray_d"],
            z, frame, train=False,
        )
    )()

    cap = eval_capacity(N_RAYS * N_SAMPLES, KEEP_FRAC)

    def geometry(r):
        z_vals = stratified_z_vals(
            r["near"], r["far"], N_SAMPLES, key=None, perturb=False
        )
        wpts = z_vals_to_pts(r["ray_o"], r["ray_d"], z_vals)
        pose_pts = world_points_to_pose_points(
            wpts.reshape(-1, 3), frame["R"], frame["Th"]
        )
        return z_vals, pose_pts

    def pass1(r):
        z_vals, pose_pts = geometry(r)
        dist_packed = pack_corner_volume(
            frame["pbw"][..., 24:25]
        ).astype(jnp.bfloat16)
        pnorm = pts_sample_blend_weights_packed(
            pose_pts, dist_packed, frame["pbounds"], n_channels=1
        )[..., 0]
        pind = keep_mask_with_argmin(pnorm, 0.0500394)
        return z_vals, pose_pts, pind

    def stage_geometry(r):
        z_vals, pose_pts = geometry(r)
        return jnp.sum(pose_pts), jnp.sum(z_vals)

    def stage_pass1(r):
        z_vals, pose_pts, pind = pass1(r)
        return jnp.sum(pind.astype(jnp.int32)), jnp.sum(z_vals)

    def stage_compact(r):
        z_vals, pose_pts, pind = pass1(r)
        vd = broadcast_viewdirs(r["ray_d"], N_SAMPLES)
        dists = z_vals_to_dists(z_vals).reshape(-1)
        sidx, slot_valid, outs, n, overflow = compact_payload(
            pind, [pose_pts, vd, dists, z_vals.reshape(-1)], cap
        )
        return sum(jnp.sum(o) for o in outs), jnp.sum(sidx)

    def stage_full(r):
        out = render_rays(model, params, r, frame, settings, train=False)
        return jnp.sum(out["rgb_map"]), out["compact_count"][0]

    variants = []
    for i in range(16):
        v = dict(rays)
        v["ray_o"] = rays["ray_o"] + jnp.float32(1e-4 * (i + 1))
        variants.append(v)

    for name, fn in [
        ("geometry (sample+warp)", stage_geometry),
        ("+ pass-1 trilerp+mask", stage_pass1),
        ("+ compaction (sort+gather)", stage_compact),
        ("full render", stage_full),
    ]:
        f = jax.jit(fn)
        for i in range(5):
            jax.tree.map(float, f(variants[i]))
        ts = []
        for i in range(8):
            t0 = time.perf_counter()
            jax.tree.map(float, f(variants[5 + i]))
            ts.append(time.perf_counter() - t0)
        print(f"{name:30s} {float(np.median(ts)) * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
